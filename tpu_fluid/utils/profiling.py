"""Per-stage wall-clock profiling harness.

The reference has no profiling at all (SURVEY.md §5.1); this provides the
steps/sec north-star measurement plus a per-stage breakdown.

Timing methodology (the measurement traps of remote-tunneled TPU runtimes,
all hit and documented in NOTES.md): dispatch is asynchronous and
`block_until_ready` can be a NO-OP, identical input buffers can be served
from a cache, and each dispatch costs ~1.4 ms of tunnel overhead.  Every
timer here therefore (a) runs the chained iterations INSIDE one program
(`lax.fori_loop`, so per-dispatch overhead is amortized 1/n), (b) chains
each iteration's output into the next iteration's input, and (c) fetches a
scalar to the host at the end to force completion.
"""

from __future__ import annotations

import time
from typing import Callable, Dict

import jax
import numpy as np

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.core.state import FluidState, initial_state
from tpu_fluid.solver.step import simulation_step


def _fetch(x):
    # slice ON DEVICE before the host transfer: device_get of a full leaf
    # would pull the whole array through the tunnel (67 MB at 256^3 — a
    # ~300 ms measurement artifact)
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def time_chained(f: Callable, x0, n: int = 10) -> float:
    """Milliseconds per call of the self-map f, measured as one program of
    n chained iterations (x_{k+1} = f(x_k)) with a host value-fetch.
    The first (untimed) run serves as compile + warmup."""
    @jax.jit
    def run(x):
        def body(_, xx):
            return f(xx)
        return jax.lax.fori_loop(0, n, body, x)

    x = run(x0)          # compile + warm
    _fetch(x)
    t0 = time.time()
    x = run(x0)
    _fetch(x)
    return (time.time() - t0) / n * 1000.0


def time_step(cfg: FluidConfig, n: int = 20,
              state: FluidState | None = None) -> float:
    """ms per full simulation step."""
    if state is None:
        state = initial_state(cfg)
    return time_chained(lambda s: simulation_step(s, cfg), state, n=n)


def stage_breakdown(cfg: FluidConfig, n: int = 10,
                    warm_steps: int = 3) -> Dict[str, float]:
    """ms per stage group, each timed as a chained self-map so the work can
    not be cached or dead-code-eliminated."""
    import jax.numpy as jnp
    from tpu_fluid.stages import (celltypes, particles, pressure,
                                  surface_fields)
    from tpu_fluid.stages import velocity as vstages

    state = initial_state(cfg)
    stepf = jax.jit(simulation_step, static_argnums=1)
    for _ in range(warm_steps):
        state = stepf(state, cfg)
    _fetch(state)
    types, vel = state.cell_types, state.velocity
    pos, act = state.positions, state.active
    div = jax.jit(pressure.compute_divergence)(vel)

    out = {}

    def dep(x, s):
        return x + 1e-30 * s

    out["01+15 occupancy scatter"] = time_chained(
        lambda p: dep(p, particles.detailed_occupancy(p, act, cfg)
                      .astype(jnp.int32).sum()), pos, n=n)
    out["02+03 cell typing"] = time_chained(
        lambda t: celltypes.update_air(celltypes.update_water(
            t.astype(jnp.int32))), types, n=n)
    out["04+05 extrapolate"] = time_chained(
        lambda v: vstages.set_extrapolated_velocities(
            types, types, v, vstages.compute_extrapolated_velocities(
                types, v)), vel, n=n)
    out["07 advect"] = time_chained(
        lambda v: vstages.advect(types, v, cfg), vel, n=n)
    out["08-10 forces/solids"] = time_chained(
        lambda v: vstages.apply_solids(
            types, vstages.diffuse(types, vstages.apply_forces(
                types, v, cfg), cfg), cfg), vel, n=n)
    out["11 divergence"] = time_chained(
        lambda v: dep(v, pressure.compute_divergence(v).sum()), vel, n=n)
    out[f"12 jacobi x{cfg.jacobi_iters}"] = time_chained(
        lambda d: pressure.jacobi_solve(types, d, cfg), div, n=max(2, n // 2))
    out["13 project"] = time_chained(
        lambda v: pressure.pressure_project(types, div, v, cfg), vel, n=n)
    out["14 move particles"] = time_chained(
        lambda p: particles.move_particles(vel, p, act, cfg), pos, n=n)
    def surf(f1):
        dd = (f1 > 0).astype(jnp.int32)
        inertia = surface_fields.update_inertia(dd, state.inertia, cfg)
        f = surface_fields.float_densities(inertia, cfg)
        a, _ = surface_fields.blur_float_densities(types, f,
                                                   state.float_dens_2, cfg)
        return a
    out["16-18 surface fields"] = time_chained(surf, state.float_dens_1, n=n)
    out["TOTAL full step"] = time_step(cfg, n=n, state=state)
    return out


def print_breakdown(cfg: FluidConfig, n: int = 10) -> None:
    bd = stage_breakdown(cfg, n=n)
    total = bd.get("TOTAL full step", 0.0)
    print(f"grid={cfg.grid_size} particles={cfg.particle_count} "
          f"jacobi={cfg.jacobi_iters} detailed={cfg.detailed_size}")
    for k, v in bd.items():
        frac = f" ({100*v/total:4.0f}%)" if total and k != "TOTAL full step" \
            else ""
        print(f"  {k:24s} {v:8.2f} ms{frac}")
