"""Pallas kernel: packed-row trilinear weight reduction + Euler update.

Consumes the (P, 64) rows produced by the packed-table gather
(ops/packed_sampler.py) and fuses everything after the gather — per-axis hat
weights, the 54-lane weighted reduction for all 3 staggered components, and
the forward-Euler position update — into one VPU pass.  The XLA version
materializes ~6 GB of weight intermediates at 1M particles; this kernel
touches rows once.

Layout: everything particle-major-minor, i.e. (lanes, P) with P on the lane
dimension, so per-lane expressions are full-width VPU ops and the 64-way
stack is a sublane concat (lane-dim stacks would relayout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_fluid.ops.packed_sampler import _OTHER, _lane


def _sample_update_kernel(rows_ref, pos_ref, act_ref, out_ref, *,
                          grid_size, dt, paired: bool = False):
    pos = pos_ref[...]                        # (3, PB)
    # Mosaic's VMEM value transpose is a bitwise-exact data-movement op
    # (verified by test; only MXU matmuls round f32 to bf16), so the rows
    # arrive in natural gather layout and flip to lane-major here instead of
    # paying a 512 MB XLA transpose.
    rows = rows_ref[...].T                    # (64 or 128, PB)
    shape = grid_size
    if paired:
        # z-halves-paired 128-lane rows (pack_table.build_packed_table_
        # pallas2): pick the particle's half by the SAME clipped z the row
        # index used (ops/packed_sampler.packed_row_indices2)
        hz = shape[2] / 2.0
        hi = jnp.clip(jnp.floor(pos[2]), 0.0, shape[2] - 1.0) >= hz
        rows = jnp.where(hi, rows[64:], rows[:64])

    jf = [jnp.clip(jnp.floor(pos[d]), 0.0, shape[d] - 1.0) for d in range(3)]

    vel = []
    for c in range(3):
        # per-axis texel coords, offsets, fractions for component c
        os_, fs = [], []
        for d in range(3):
            t = jnp.clip(pos[d] - 0.5 + (0.5 if d == c else 0.0),
                         0.0, shape[d] - 1.0)
            i0 = jnp.floor(t)
            os_.append(i0 - jf[d])
            fs.append(t - i0)
        a1, a2 = _OTHER[c]

        def axw(d, delta):
            return ((os_[d] == delta) * (1.0 - fs[d])
                    + (os_[d] == delta - 1) * fs[d])

        acc = jnp.zeros_like(pos[0])
        for dc in (0, 1):
            wc = (1.0 - fs[c]) if dc == 0 else fs[c]
            for d1 in (-1, 0, 1):
                w1 = axw(a1, d1)
                for d2 in (-1, 0, 1):
                    ln = _lane(c, dc, d1, d2)
                    acc = acc + (wc * w1 * axw(a2, d2)) * rows[ln]
        vel.append(acc)

    act = act_ref[0]
    for d in range(3):
        out_ref[d] = pos[d] + jnp.where(act > 0.5, vel[d] * dt, 0.0)


def sample_and_move(rows: jnp.ndarray, pos_t: jnp.ndarray,
                    active: jnp.ndarray, grid_size, dt: float,
                    pb: int = 8192, interpret: bool = False) -> jnp.ndarray:
    """rows: (P, 64) gathered packed rows — or (P, 128) z-halves-paired
    rows (detected by width) — in natural gather layout; the flip to
    lane-major happens in VMEM.  pos_t: (3, P); active: (P,).
    Returns new positions (3, P)."""
    p = pos_t.shape[1]
    lanes = rows.shape[1]
    # Non-dividing grids are fine: Mosaic pads the last block's loads with
    # unspecified values and masks its out-of-range stores, which our
    # pointwise kernel tolerates.  NO padding of any operand — padding the
    # gathered rows is a 256 MB whole-array HBM copy (1.6 ms at 1M) and
    # padding the gather indices instead knocks the XLA gather off its fast
    # path (7.9 -> 13.5 ms measured), so both are strictly worse.
    grid = (-(-p // pb),)
    kernel = functools.partial(_sample_update_kernel,
                               grid_size=tuple(float(g) for g in grid_size),
                               dt=dt, paired=(lanes == 128))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((pb, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, pb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, pb), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, p), pos_t.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(rows, pos_t, active.astype(pos_t.dtype).reshape(1, -1))
    return out
