"""Explicit halo-exchange solver path (shard_map + ppermute over ICI).

The GSPMD path (parallel/sharded.py) lets XLA derive halo exchanges for the
whole step.  For the hot Poisson loop — 200 dependent radius-1 stencils, the
dominant communication pattern at scale (SURVEY.md §5.7) — this module also
provides a hand-written SPMD implementation: x-slab shards exchange one
boundary plane per sweep with `jax.lax.ppermute` (two neighbor sends riding
ICI), everything else stays local.  Shards at the domain ends receive zeros
from ppermute, which is exactly the solver's zero-padded out-of-domain
neighbor semantics.

tests/test_halo.py pins it to the single-device solve on an 8-way CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.core.types import CellType
from tpu_fluid.ops.stencil import MOVES, shifted
from tpu_fluid.parallel.mesh import AXIS
from tpu_fluid.stages.pressure import jacobi_stats


def halo_planes(a: jnp.ndarray, h: int, axis_name: str = AXIS):
    """The h boundary planes this shard receives from its -x and +x
    neighbors (`jax.lax.ppermute`, two neighbor sends over ICI).  Operates
    on the x axis = dim ndim-3, so (Lx, Y, Z) fields and (C, Lx, Y, Z)
    stacks both work.  Domain-end shards receive zeros (ppermute leaves
    non-receivers zeroed) — the out-of-domain convention of every stencil
    stage (`shifted`'s zero fill)."""
    ax = a.ndim - 3
    n = jax.lax.axis_size(axis_name)
    idx_last = [slice(None)] * a.ndim
    idx_last[ax] = slice(a.shape[ax] - h, None)
    idx_first = [slice(None)] * a.ndim
    idx_first[ax] = slice(0, h)
    if n == 1:
        # no neighbors: both halos are the domain-end zeros.  Semantically
        # identical to the empty-pair ppermute below — but XLA:TPU's
        # degenerate collective-permute measured 2-59 ms EACH on silicon
        # (round-5 NOTES, SPMD trace), so the 1-device mesh shortcuts it.
        return (jnp.zeros_like(a[tuple(idx_last)]),
                jnp.zeros_like(a[tuple(idx_first)]))
    up = [(j, j + 1) for j in range(n - 1)]      # send +x
    down = [(j + 1, j) for j in range(n - 1)]    # send -x
    from_left = jax.lax.ppermute(a[tuple(idx_last)], axis_name, up)
    from_right = jax.lax.ppermute(a[tuple(idx_first)], axis_name, down)
    return from_left, from_right


def halo_extend(a: jnp.ndarray, h: int, axis_name: str = AXIS) -> jnp.ndarray:
    """Local (…, Lx, Y, Z) block -> (…, Lx + 2h, Y, Z) with real neighbor
    halos (zeros past the domain ends)."""
    left, right = halo_planes(a, h, axis_name)
    return jnp.concatenate([left, a, right], axis=a.ndim - 3)


def halo_inner(a: jnp.ndarray, h: int = 1) -> jnp.ndarray:
    """Strip h halo planes from each side of the x axis (dim ndim-3)."""
    idx = [slice(None)] * a.ndim
    idx[a.ndim - 3] = slice(h, a.shape[a.ndim - 3] - h)
    return a[tuple(idx)]


def exchange_x_halo(x: jnp.ndarray, axis_name: str = AXIS) -> jnp.ndarray:
    """Append 1-cell halo planes from the x-neighbors of this shard.
    x: local (Lx, Y, Z) block -> (Lx + 2, Y, Z); domain-edge shards get
    zero planes (ppermute leaves non-receivers zeroed)."""
    return halo_extend(x, 1, axis_name)


def _local_sweep(p, water, rd, c2, axis_name):
    """One Jacobi sweep on a local x-slab with explicit halo exchange."""
    pw = jnp.where(water, p, 0.0)
    padded = exchange_x_halo(pw, axis_name)      # (Lx+2, Y, Z)
    neigh = padded[:-2] + padded[2:]             # x neighbors via halo
    for mv in ((0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)):
        neigh = neigh + shifted(pw, mv)          # y/z are unsharded
    return jnp.where(rd > 0.0, neigh * rd + c2, p)


def jacobi_solve_halo(mesh: Mesh, types: jnp.ndarray, div: jnp.ndarray,
                      cfg: FluidConfig) -> jnp.ndarray:
    """Sharded Jacobi solve with hand-written ICI halo exchange; same
    folded-constant formulation (and results) as stages/pressure.jacobi_solve.
    `types`/`div` may carry any sharding; outputs are x-slab sharded."""
    water, aii, n_air = jacobi_stats(types, cfg)
    b = div.astype(jnp.float32) * (cfg.fluid_density * cfg.cell_width
                                   / cfg.dt)
    denom = jnp.maximum(aii, 1.0)
    rd = jnp.where(water & (aii > 0), 1.0 / denom, 0.0)
    c2 = (n_air * cfg.air_pressure - b) / denom
    iters = cfg.jacobi_iters - (1 if cfg.reference_pressure_parity else 0)
    p0 = jnp.full(types.shape, cfg.air_pressure, dtype=jnp.float32)

    def solve(p, water, rd, c2):
        def body(_, p):
            return _local_sweep(p, water, rd, c2, AXIS)
        return jax.lax.fori_loop(0, iters, body, p)

    spec = P(AXIS)
    fn = jax.shard_map(solve, mesh=mesh,
                       in_specs=(spec, spec, spec, spec),
                       out_specs=spec)
    sh = NamedSharding(mesh, spec)
    return fn(jax.device_put(p0, sh), jax.device_put(water, sh),
              jax.device_put(rd, sh), jax.device_put(c2, sh))


def jit_jacobi_halo(mesh: Mesh, cfg: FluidConfig):
    return jax.jit(functools.partial(jacobi_solve_halo, mesh, cfg=cfg))
