"""Packed-neighborhood staggered velocity sampler — the TPU-fast path for
per-particle sampling.

Why: TPU has no hardware gather; XLA lowers per-element random access to
~10 ns/element scalar loads, which made the naive 24-gathers-per-particle
sampler (ops/sampling.py) dominate the whole step.  Random *row* access
(contiguous lane vectors) runs ~30x faster because each access is one DMA.

Design: for every cell j, precompute one 64-lane row containing every
velocity value any particle inside j can touch.  For a particle at p with
cell j = floor(p), the staggered trilinear stencil of component c spans
offsets delta_c in {0,1} along axis c and delta_d in {-1,0,1} along the other
two axes (derivation: texel coord t_d = p_d - 0.5 + 0.5*[d==c], so
floor(t_d) in {j_d-1, j_d} for d != c and exactly j_c for d == c).  That is
2*3*3 = 18 values per component, 54 per cell, padded to 64 lanes.

Sampling = one (P, 64) row gather + a lane-masked weighted reduction, fully
vectorized on the VPU.  Semantics (incl. clamp-to-edge out-of-range behavior)
match ops/sampling.velocity_at, which golden tests pin to the reference
sampler contract (fluid_flow_sections.h:94-95, 07_advect/advect.comp:37-59).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LANES = 64
_OTHER = {0: (1, 2), 1: (0, 2), 2: (0, 1)}


def _lane(c: int, dc: int, d1: int, d2: int) -> int:
    """Lane index for component c, offset dc in {0,1} along axis c, offsets
    d1,d2 in {-1,0,1} along the two other axes (in ascending axis order)."""
    return c * 18 + dc * 9 + (d1 + 1) * 3 + (d2 + 1)


def _edge_shift(a: jnp.ndarray, offset) -> jnp.ndarray:
    """out[i] = a[clip(i + offset)] — edge-replicated shift (clamp-to-edge)."""
    pads = []
    slices = []
    for ax, off in enumerate(offset):
        n = a.shape[ax]
        if off >= 0:
            pads.append((0, off))
            slices.append(slice(off, off + n))
        else:
            pads.append((-off, 0))
            slices.append(slice(0, n))
    if all(p == (0, 0) for p in pads):
        return a
    return jnp.pad(a, pads, mode="edge")[tuple(slices)]


def build_packed_table(vel: jnp.ndarray) -> jnp.ndarray:
    """vel (3, X, Y, Z) -> packed table (X*Y*Z, 64).

    Pure edge-replicated shifts; XLA fuses this into a few passes over HBM.
    Built once per consumer stage, amortized over all particles.
    """
    gx, gy, gz = vel.shape[1:]
    lanes = [None] * LANES
    for c in range(3):
        a1, a2 = _OTHER[c]
        for dc in (0, 1):
            for d1 in (-1, 0, 1):
                for d2 in (-1, 0, 1):
                    off = [0, 0, 0]
                    off[c] = dc
                    off[a1] = d1
                    off[a2] = d2
                    lanes[_lane(c, dc, d1, d2)] = _edge_shift(
                        vel[c], tuple(off))
    zero = jnp.zeros_like(vel[0])
    # Stack on the LEADING axis (layout-friendly concat), then transpose to
    # (K, 64) *on the MXU* via contraction with the identity.  A plain
    # jnp.stack(axis=-1) or .T makes XLA layout-assign each lane slice as a
    # (K,1)/(1,K) tile-padded buffer — a 128x memory blowup that OOMs at
    # 128^3 grids; the dot_general formulation keeps natural layouts on both
    # sides and costs a negligible K*64*64 MACs.
    stacked = jnp.stack([l if l is not None else zero for l in lanes],
                        axis=0).reshape(LANES, gx * gy * gz)
    eye = jnp.eye(LANES, dtype=stacked.dtype)
    # Precision.HIGHEST: the MXU rounds f32 operands to bf16 by default,
    # which would quantize every velocity to ~3 digits; HIGHEST (bf16x3
    # decomposition) passes f32 through the identity exactly.
    return jax.lax.dot_general(stacked, eye, (((0,), (0,)), ((), ())),
                               preferred_element_type=stacked.dtype,
                               precision=jax.lax.Precision.HIGHEST)


def packed_row_indices(pos: jnp.ndarray, grid_size) -> jnp.ndarray:
    """Flat table-row index of each particle's cell (clipped to the grid)."""
    gx, gy, gz = grid_size
    j = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0,
                 jnp.array([gx - 1, gy - 1, gz - 1], dtype=jnp.int32))
    return j[:, 0] * (gy * gz) + j[:, 1] * gz + j[:, 2]


def packed_row_indices2(pos: jnp.ndarray, grid_size) -> jnp.ndarray:
    """Row index into the z-halves-paired 128-lane table
    (kernels/pack_table.build_packed_table_pallas2); the in-row half is
    recomputed in the sample kernel from the same clipped z."""
    gx, gy, gz = grid_size
    hz = gz // 2
    j = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0,
                 jnp.array([gx - 1, gy - 1, gz - 1], dtype=jnp.int32))
    zl = jnp.where(j[:, 2] >= hz, j[:, 2] - hz, j[:, 2])
    return j[:, 0] * (gy * hz) + j[:, 1] * hz + zl


def sample_velocity_packed(table: jnp.ndarray, grid_size,
                           pos: jnp.ndarray) -> jnp.ndarray:
    """Sample the staggered velocity at positions pos (P, 3) from a packed
    table.  Returns (P, 3).  Equivalent to ops/sampling.velocity_at."""
    gx, gy, gz = grid_size
    j = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0,
                 jnp.array([gx - 1, gy - 1, gz - 1], dtype=jnp.int32))
    flat = (j[:, 0] * (gy * gz) + j[:, 1] * gz + j[:, 2])
    rows = jnp.take(table, flat, axis=0)            # (P, 64) one row gather
    return apply_packed_rows(rows, grid_size, pos)


def apply_packed_rows(rows: jnp.ndarray, grid_size,
                      pos: jnp.ndarray) -> jnp.ndarray:
    """The weight/reduction half of the packed sampler: (P, 64) gathered
    rows + (P, 3) positions -> (P, 3) velocities.  Split out so callers with
    their own row-gather (e.g. the domain-sharded particle path, which
    gathers from a halo-extended LOCAL table) reuse the exact weight math."""
    gx, gy, gz = grid_size
    shape = jnp.array([gx, gy, gz], dtype=pos.dtype)
    j = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0,
                 jnp.array([gx - 1, gy - 1, gz - 1], dtype=jnp.int32))
    jf = j.astype(pos.dtype)
    out = []
    for c in range(3):
        a1, a2 = _OTHER[c]
        # Texel coords per axis for component c, clamped (clamp-to-edge).
        half = jnp.array([0.5 if d == c else 0.0 for d in range(3)],
                         dtype=pos.dtype)
        t = jnp.clip(pos - 0.5 + half, 0.0, shape - 1)
        i0 = jnp.floor(t)
        f = t - i0                                   # (P, 3) lerp fractions
        o = i0 - jf                                  # lower-corner offset
        # axis c: o_c == 0 always (see module docstring); weights (1-f, f)
        wc = jnp.stack([1.0 - f[:, c], f[:, c]], axis=-1)       # (P, 2)

        def axis_w(d):
            # weight of offsets {-1, 0, 1} on axis d: hat at o_d, o_d + 1
            od = o[:, d]
            fd = f[:, d]
            deltas = jnp.array([-1.0, 0.0, 1.0], dtype=pos.dtype)
            lo = (od[:, None] == deltas[None, :]) * (1.0 - fd[:, None])
            hi = ((od + 1.0)[:, None] == deltas[None, :]) * fd[:, None]
            return lo + hi                                       # (P, 3)

        w1 = axis_w(a1)
        w2 = axis_w(a2)
        # combined weights over the 18 lanes of this component
        w = (wc[:, :, None, None] * w1[:, None, :, None]
             * w2[:, None, None, :]).reshape(-1, 18)
        block = rows[:, c * 18:(c + 1) * 18]
        out.append(jnp.sum(block * w, axis=-1))
    return jnp.stack(out, axis=-1)
