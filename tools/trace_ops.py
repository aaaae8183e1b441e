"""Per-op device-time itemization of the bench step (VERDICT round-4
item 1.iii: name every op inside the ~0.9 ms 'misc XLA stages' residual).

Captures a jax.profiler trace of `TRACE_STEPS` chained simulation steps at
the bench config and prints every device op's total/self time, sorted,
as JSON lines — the committed evidence behind NOTES.md's round-5 roofline
table.

Usage: python tools/trace_ops.py [grid] [> ops.jsonl]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import tempfile

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
import numpy as np

TRACE_STEPS = 5


def capture(n: int, spmd: bool = False) -> str:
    from tpu_fluid.core.config import FluidConfig
    from tpu_fluid.core.state import initial_state
    from tpu_fluid.solver.step import simulation_step
    from tpu_fluid.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = FluidConfig.scaled_scene(n, particle_count=1000000,
                                   jacobi_iters=200)
    if spmd:   # the program form TPU_FLUID_BENCH_SPMD=1 benches
        from tpu_fluid.parallel.mesh import make_mesh
        from tpu_fluid.parallel.particles_domain import domain_shard_state
        from tpu_fluid.parallel.spmd_step import spmd_step
        cfg = cfg.replace(particle_sharding="domain")
        mesh = make_mesh()
        state = domain_shard_state(initial_state(cfg), mesh, cfg)
        sstep = spmd_step(mesh, cfg, donate=False)

        def step(s, _cfg):
            return sstep(s)
    else:
        step = jax.jit(simulation_step, static_argnums=1)
        state = initial_state(cfg)
    for _ in range(3):                      # compile + warm
        state = step(state, cfg)
    np.asarray(jax.device_get(state.step))

    logdir = tempfile.mkdtemp(prefix="tpu_fluid_trace_")
    with jax.profiler.trace(logdir):
        for _ in range(TRACE_STEPS):
            state = step(state, cfg)
        np.asarray(jax.device_get(state.step))
    return logdir


def parse(logdir: str):
    """Sum per-op device time from the xplane proto (TPU op lanes)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    ops = {}
    for path in paths:
        xspace = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xspace.ParseFromString(f.read())
        for plane in xspace.planes:
            # device planes only (TPU:0 / device compute lanes)
            if not (plane.name.startswith("/device")
                    or "TPU" in plane.name):
                continue
            emeta = plane.event_metadata
            for line in plane.lines:
                for ev in line.events:
                    name = emeta[ev.metadata_id].name
                    dur = ev.duration_ps / 1e9  # ps -> ms
                    t, c = ops.get(name, (0.0, 0))
                    ops[name] = (t + dur, c + 1)
    return ops


def main():
    args = [a for a in sys.argv[1:] if a != "--spmd"]
    n = int(args[0]) if args else 128
    logdir = capture(n, spmd="--spmd" in sys.argv)
    ops = parse(logdir)
    total = 0.0
    rows = sorted(ops.items(), key=lambda kv: -kv[1][0])
    for name, (ms, cnt) in rows:
        per_step = ms / TRACE_STEPS
        if per_step < 0.001:
            continue
        total += per_step
        print(json.dumps({"op": name, "ms_per_step": round(per_step, 4),
                          "count_per_step": cnt / TRACE_STEPS}))
    print(json.dumps({"op": "TOTAL(listed)", "ms_per_step": round(total, 3)}))
    print(f"trace dir: {logdir}", file=sys.stderr)


if __name__ == "__main__":
    main()
