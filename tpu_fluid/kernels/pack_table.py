"""Pallas kernel: build the packed 64-lane velocity neighborhood table.

The XLA construction (ops/packed_sampler.build_packed_table) pays ~3.3 GB of
HBM traffic at 128^3: 54 edge-padded shift copies plus an MXU identity
transpose.  Here each x-slab program assembles the 3x3x3 neighborhood of its
slab in VMEM (x-halo via prev/cur/next block views, y/z edge replication
in-register), stacks the 54 lane values as a (64, M) block and transposes it
in VMEM — HBM traffic is one read of the velocity field (x3 halo overlap)
plus one write of the table (~0.8 GB at 128^3).

The in-VMEM transpose is a Mosaic data-movement op (exact), not an MXU
matmul, so no bf16 rounding is involved.  tests/test_fast_paths.py pins the
result to the XLA construction bitwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_fluid.kernels.halo import clamped_halo_maps
from tpu_fluid.ops.packed_sampler import LANES, _OTHER, _lane


def _pack_kernel(prev_ref, cur_ref, next_ref, out_ref, *, shape,
                 pair_z: bool = False):
    gx, gy, gz = shape
    # assemble (3, 3, Y, Z): x rows {-1, 0, +1} around this slab (tx == 1).
    # The neighbor rows are read straight from the UNPADDED field via
    # clamped index maps (max(i-1, 0) / min(i+1, gx-1)) — the clamp IS the
    # edge replication mode="edge" used to pad, so domain ends need no
    # masking and the padded copy of vel (two pad fusions + a 203 MB
    # intermediate at 256^3, ~1.5 ms) is gone.
    a = jnp.concatenate([prev_ref[...], cur_ref[...], next_ref[...]],
                        axis=1)
    # y/z edge replication -> (3, 3, Y+2, Z+2)
    a = jnp.concatenate([a[:, :, :1], a, a[:, :, -1:]], axis=2)
    a = jnp.concatenate([a[..., :1], a, a[..., -1:]], axis=3)

    lane_vals = {}
    for c in range(3):
        a1, a2 = _OTHER[c]
        for dc in (0, 1):
            for d1 in (-1, 0, 1):
                for d2 in (-1, 0, 1):
                    off = [0, 0, 0]
                    off[c] = dc
                    off[a1] = d1
                    off[a2] = d2
                    lane_vals[_lane(c, dc, d1, d2)] = a[
                        c, 1 + off[0],
                        1 + off[1]:1 + off[1] + gy,
                        1 + off[2]:1 + off[2] + gz]
    zero = jnp.zeros((gy, gz), dtype=out_ref.dtype)
    stacked = jnp.stack([lane_vals.get(ln, zero) for ln in range(LANES)],
                        axis=0)                     # (64, Y, Z)
    # exact data-movement transpose in VMEM (not an MXU matmul -> no bf16)
    t = jnp.transpose(stacked, (1, 2, 0))           # (Y, Z, 64)
    if pair_z:
        # 2 cells per 128-lane row, paired across z-HALVES (contiguous
        # sublane slices + one lane concat — the (Z,64)->(Z/2,128) lane-
        # merge reshape is rejected by Mosaic): lanes [0:64] = cell
        # (x, y, zl), [64:128] = (x, y, zl + Z/2).  Full-width rows write
        # full (8,128) tiles and measured 1.49 vs 1.77 ms at 128^3.
        h = gz // 2
        out_ref[0] = jnp.concatenate([t[:, :h, :], t[:, h:, :]], axis=-1)
    else:
        out_ref[0] = t


def build_packed_table_pallas(vel: jnp.ndarray,
                              interpret: bool = False) -> jnp.ndarray:
    """vel (3, X, Y, Z) -> packed table (X*Y*Z, 64); same contents as
    ops/packed_sampler.build_packed_table."""
    _, gx, gy, gz = vel.shape
    kern = functools.partial(_pack_kernel, shape=(gx, gy, gz))
    out = pl.pallas_call(
        kern,
        grid=(gx,),
        in_specs=list(_xrow_specs(gx, gy, gz)),
        out_specs=pl.BlockSpec((1, gy, gz, LANES), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gx, gy, gz, LANES), vel.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(vel, vel, vel)
    # row-major (X, Y, Z, 64) -> (X*Y*Z, 64) is a free reshape
    return out.reshape(gx * gy * gz, LANES)


def _xrow_specs(gx, gy, gz):
    """(prev, cur, next) single-x-row block specs with CLAMPED index maps —
    the clamp replicates the border row, exactly mode="edge" (the
    degenerate r0=1 case of kernels/halo.clamped_halo_maps, with no
    in-kernel masking: the replication IS the wanted convention)."""
    lo, hi = clamped_halo_maps(1, gx - 1)
    prev = pl.BlockSpec((3, 1, gy, gz), lambda i: (0, lo(i), 0, 0),
                        memory_space=pltpu.VMEM)
    cur = pl.BlockSpec((3, 1, gy, gz), lambda i: (0, i, 0, 0),
                       memory_space=pltpu.VMEM)
    nxt = pl.BlockSpec((3, 1, gy, gz), lambda i: (0, hi(i), 0, 0),
                       memory_space=pltpu.VMEM)
    return prev, cur, nxt


def build_packed_table_pallas2(vel: jnp.ndarray,
                               interpret: bool = False) -> jnp.ndarray:
    """vel (3, X, Y, Z) -> z-halves-paired table (X*Y*(Z/2), 128): row
    r = x*(Y*Z/2) + y*(Z/2) + zl holds cell (x, y, zl) in lanes [0:64] and
    cell (x, y, zl + Z/2) in lanes [64:128] (ops/packed_sampler.
    packed_row_indices2).  Requires even Z."""
    _, gx, gy, gz = vel.shape
    assert gz % 2 == 0
    kern = functools.partial(_pack_kernel, shape=(gx, gy, gz), pair_z=True)
    out = pl.pallas_call(
        kern,
        grid=(gx,),
        in_specs=list(_xrow_specs(gx, gy, gz)),
        out_specs=pl.BlockSpec((1, gy, gz // 2, 2 * LANES),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gx, gy, gz // 2, 2 * LANES),
                                       vel.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(vel, vel, vel)
    return out.reshape(gx * gy * (gz // 2), 2 * LANES)
