"""Pressure solve stages: divergence (11), Jacobi iteration (12), projection
(13).

Reference: `11_compute_divergence/compute_divergence.comp`,
`12_solve_pressure/pressure.comp`, `13_fix_divergence/fix_divergence.comp`.

The reference runs 200 separate Jacobi dispatches with full pipeline barriers
between them (`fluid_flow_sections.h:300-313`); here the whole solve is one
`lax.fori_loop` inside the jitted step — a single XLA while loop with no
launch overhead.  Functionally a Jacobi sweep is `p_new = f(p_old)`, so no
explicit ping-pong buffers are needed; XLA double-buffers the loop carry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.core.types import CellType
from tpu_fluid.ops.stencil import MOVES, shifted


def compute_divergence(vel: jnp.ndarray) -> jnp.ndarray:
    """Stage 11: div(i) = sum_c v_c(i + e_c) - v_c(i) — outflow minus inflow
    on staggered faces (`compute_divergence.comp:18-29`).  Out-of-grid reads
    are zero (GLSL robust access)."""
    div = jnp.zeros(vel.shape[1:], dtype=vel.dtype)
    for c in range(3):
        up = tuple(1 if k == c else 0 for k in range(3))
        div = div + shifted(vel[c], up) - vel[c]
    return div


def jacobi_stats(types: jnp.ndarray, cfg: FluidConfig):
    """Per-frame constants of the Jacobi sweep: water mask, diagonal count
    aii (non-solid neighbors), and the constant air-pressure contribution.

    In `pressure.comp:41-62`, each non-solid neighbor increments aii; a WATER
    neighbor contributes its previous pressure, any other non-solid neighbor
    (AIR or INACTIVE) contributes the constant pressure_air.
    """
    water = types == CellType.WATER
    solid = types == CellType.SOLID
    aii = jnp.zeros(types.shape, dtype=jnp.float32)
    n_air = jnp.zeros(types.shape, dtype=jnp.float32)
    for mv in MOVES:
        # Out-of-grid neighbors read as INACTIVE (non-solid) in GLSL; water
        # cells never touch the border (it is SOLID), so this is unobservable
        # for cells the sweep actually updates.
        nb_solid = shifted(solid, mv, fill=False)
        nb_water = shifted(water, mv, fill=False)
        aii = aii + (~nb_solid)
        n_air = n_air + (~nb_solid & ~nb_water)
    return water, aii, n_air


def jacobi_solve(types: jnp.ndarray, div: jnp.ndarray,
                 cfg: FluidConfig, axis_name: str | None = None
                 ) -> jnp.ndarray:
    """Stage 12: Jacobi pressure iteration, WATER cells only
    (`pressure.comp:52-77`).

    p_new = (sum_{water nbrs} p_j + n_air * p_air - b) / aii, with
    b = div * rho * dx / dt.  Non-water cells keep their initial value
    p_air (both ping-pong buffers are cleared to air pressure each frame,
    `fluid_flow_sections.h:298-299`).

    The reference's projection stage reads PRESSURES_2, which after 200
    alternating iterations holds the 199th iterate (SURVEY.md §2.4#13); with
    `cfg.reference_pressure_parity` we therefore run jacobi_iters - 1 sweeps.

    With `axis_name` (inside shard_map over x-slabs) all inputs/outputs are
    local blocks and each sweep (XLA path) or K-sweep pass (Pallas path)
    exchanges boundary planes with the x-neighbor shards via ppermute.
    """
    b = div.astype(jnp.float32) * (cfg.fluid_density * cfg.cell_width / cfg.dt)
    iters = cfg.jacobi_iters - (1 if cfg.reference_pressure_parity else 0)
    return poisson_solve(types, b, cfg, iters=iters,
                         boundary_value=cfg.air_pressure,
                         axis_name=axis_name)


def poisson_solve(types: jnp.ndarray, rhs: jnp.ndarray, cfg: FluidConfig,
                  iters: int, boundary_value: float,
                  axis_name: str | None = None) -> jnp.ndarray:
    """The stage-12 Jacobi machinery with an arbitrary right-hand side and
    non-water boundary value:  on WATER cells with aii > 0,

        p = (sum_{water nbrs} p + n_air * boundary_value - rhs) / aii

    iterated `iters` times from p0 = boundary_value.  `jacobi_solve` is the
    reference pressure instance (rhs = div * rho * dx / dt); the volume
    projection (stages/volume.py) reuses it with rhs = density error and a
    zero boundary."""
    from tpu_fluid.kernels import pallas_choice

    if axis_name is not None:
        # neighbor counts (aii/n_air) need the boundary planes of the
        # x-neighbor shards; compute on the halo-extended block and slice
        from tpu_fluid.parallel.halo import halo_extend, halo_inner
        water, aii, n_air = jacobi_stats(
            halo_extend(types, 1, axis_name), cfg)
        water, aii, n_air = (halo_inner(water), halo_inner(aii),
                             halo_inner(n_air))
    else:
        water, aii, n_air = jacobi_stats(types, cfg)
    const = n_air * boundary_value - rhs.astype(jnp.float32)
    denom = jnp.maximum(aii, 1.0)
    update_mask = water & (aii > 0)
    p0 = jnp.full(types.shape, boundary_value, dtype=jnp.float32)
    if axis_name is not None:
        # the loop carry must be marked shard-varying up front (the sweeps'
        # ppermute outputs are), or shard_map's VMA check rejects the loop
        p0 = jax.lax.pcast(p0, axis_name, to="varying")

    use_pallas, interpret = pallas_choice(cfg)
    if cfg.pressure_solver == "redblack":
        use_pallas = False     # XLA formulation only (masked half-sweeps)
    if use_pallas:
        # K-fused Pallas sweeps: fold the per-cell constants so one sweep is
        # q' = where(rd>0, neigh*rd + c2, q), with q the water-masked
        # pressure (the kernel never sees the water mask — kernels/jacobi.py)
        from tpu_fluid.kernels.jacobi import (jacobi_sweeps_pallas,
                                              jacobi_sweeps_sharded)
        # rd ships as the u8 aii-code (7 distinct values); the kernel
        # decodes it to the identical f32 field (kernels/jacobi._decode_rd)
        # at 1/4 the HBM stream
        rd = jnp.where(update_mask, aii, 0.0).astype(jnp.uint8)
        c2 = const / denom
        q0 = jnp.where(water, p0, 0.0)
        if axis_name is not None:
            q = jacobi_sweeps_sharded(q0, rd, c2, iters, axis_name,
                                      interpret=interpret)
        else:
            q = jacobi_sweeps_pallas(q0, rd, c2, iters, interpret=interpret)
        return jnp.where(water, q, boundary_value)

    if axis_name is not None:
        from tpu_fluid.parallel.halo import exchange_x_halo

        def neigh_sum_halo(p):
            pw = jnp.where(water, p, 0.0)
            padded = exchange_x_halo(pw, axis_name)   # (Lx+2, Y, Z)
            # accumulate in MOVES order (x-neighbors from the halo planes)
            # so the FP sum order matches the single-device sweep bitwise
            neigh = jnp.zeros_like(p)
            for mv in MOVES:
                if mv == (1, 0, 0):
                    neigh = neigh + padded[2:]
                elif mv == (-1, 0, 0):
                    neigh = neigh + padded[:-2]
                else:
                    neigh = neigh + shifted(pw, mv)
            return neigh

        if cfg.pressure_solver == "redblack":
            lx, gy_, gz_ = types.shape
            gx0 = jax.lax.axis_index(axis_name).astype(jnp.int32) * lx
            par = (((gx0 + jnp.arange(lx))[:, None, None]
                    + jnp.arange(gy_)[None, :, None]
                    + jnp.arange(gz_)[None, None, :]) % 2) == 0

            def half_halo(p, mask):
                p_new = (neigh_sum_halo(p) + const) / denom
                return jnp.where(update_mask & mask, p_new, p)

            def sweep_rb_halo(_, p):
                p = half_halo(p, par)
                return half_halo(p, ~par)

            return jax.lax.fori_loop(0, iters, sweep_rb_halo, p0)

        def sweep_halo(_, p):
            p_new = (neigh_sum_halo(p) + const) / denom
            return jnp.where(update_mask, p_new, p)

        return jax.lax.fori_loop(0, iters, sweep_halo, p0)

    def sweep(_, p):
        pw = jnp.where(water, p, 0.0)
        neigh = jnp.zeros_like(p)
        for mv in MOVES:
            neigh = neigh + shifted(pw, mv)
        p_new = (neigh + const) / denom
        return jnp.where(update_mask, p_new, p)

    if cfg.pressure_solver == "redblack":
        # Red-black Gauss-Seidel (flag-gated beyond-reference solver):
        # black cells read the freshly-updated red half within the same
        # iteration, roughly doubling convergence per sweep vs Jacobi
        # (pinned by tests/test_redblack.py).  The reference's parity
        # semantics need plain Jacobi, which stays the default.
        gx_, gy_, gz_ = types.shape
        par = ((jnp.arange(gx_)[:, None, None]
                + jnp.arange(gy_)[None, :, None]
                + jnp.arange(gz_)[None, None, :]) % 2) == 0

        def half(p, mask):
            pw = jnp.where(water, p, 0.0)
            neigh = jnp.zeros_like(p)
            for mv in MOVES:
                neigh = neigh + shifted(pw, mv)
            p_new = (neigh + const) / denom
            return jnp.where(update_mask & mask, p_new, p)

        def sweep_rb(_, p):
            p = half(p, par)
            return half(p, ~par)

        return jax.lax.fori_loop(0, iters, sweep_rb, p0)

    return jax.lax.fori_loop(0, iters, sweep, p0)


def pressure_project(types: jnp.ndarray, pressure: jnp.ndarray,
                     vel: jnp.ndarray, cfg: FluidConfig) -> jnp.ndarray:
    """Stage 13: subtract the pressure gradient
    (`fix_divergence.comp:41-72`).  Component c of cell i changes by
    -dt/(rho*dx) * (p(i) - p(i - e_c)) iff i_c != 0, at least one of the two
    adjacent cells is WATER, and neither is SOLID."""
    water = types == CellType.WATER
    solid = types == CellType.SOLID
    scale = cfg.dt / (cfg.fluid_density * cfg.cell_width)
    out = []
    for c in range(3):
        mv = tuple(-1 if k == c else 0 for k in range(3))
        lo_water = shifted(water, mv, fill=False)
        lo_solid = shifted(solid, mv, fill=False)
        idx = jnp.arange(types.shape[c])
        nonzero = (idx != 0).reshape(
            tuple(-1 if k == c else 1 for k in range(3)))
        cond = nonzero & (water | lo_water) & ~solid & ~lo_solid
        grad = pressure - shifted(pressure, mv)
        dv = jnp.where(cond, grad, 0.0).astype(vel.dtype)
        out.append(vel[c] - scale * dv)
    return jnp.stack(out)
