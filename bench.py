"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline (BASELINE.json): full simulation steps/sec at a 128^3 grid with 1M
particles (full 19-stage pipeline incl. 200 Jacobi iterations and the
detailed surface-field stages), measured on the available TPU device(s).
vs_baseline is steps_per_sec / 60 (the driver-defined target).

Env overrides: TPU_FLUID_BENCH_GRID, TPU_FLUID_BENCH_PARTICLES,
TPU_FLUID_BENCH_STEPS.
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    import jax
    import numpy as np

    from tpu_fluid.core.config import FluidConfig
    from tpu_fluid.core.state import initial_state
    from tpu_fluid.solver.step import simulation_step

    n = int(os.environ.get("TPU_FLUID_BENCH_GRID", "128"))
    particles = int(os.environ.get("TPU_FLUID_BENCH_PARTICLES", "1000000"))
    steps = int(os.environ.get("TPU_FLUID_BENCH_STEPS", "60"))

    cfg = FluidConfig.scaled_scene(n, particle_count=particles,
                                   jacobi_iters=200)
    ndev = len(jax.devices())
    if ndev > 1:
        # explicit SPMD path: shard_map + ppermute halos, Pallas kernels on
        # local blocks — the multi-chip fast path (parallel/spmd_step.py)
        from tpu_fluid.parallel.mesh import make_mesh, shard_state
        from tpu_fluid.parallel.spmd_step import spmd_step
        mesh = make_mesh()
        state = shard_state(initial_state(cfg), mesh)
        step = spmd_step(mesh, cfg, donate=False)
    else:
        step = jax.jit(simulation_step, static_argnums=1)
        state = initial_state(cfg)

    def run(s):
        return step(s, cfg) if ndev == 1 else step(s)

    # warmup + compile
    state = run(state)
    np.asarray(jax.device_get(state.step))

    t0 = time.time()
    for _ in range(steps):
        state = run(state)
    np.asarray(jax.device_get(state.step))  # force completion
    dt = time.time() - t0

    sps = steps / dt
    print(json.dumps({
        "metric": f"sim steps/sec @ {n}^3 grid, {particles} particles, "
                  f"200 Jacobi iters ({ndev} TPU chip(s))",
        "value": round(sps, 2),
        "unit": "steps/s",
        "vs_baseline": round(sps / 60.0, 3),
    }))


if __name__ == "__main__":
    main()
