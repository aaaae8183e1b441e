"""Shift/neighbor helpers for 6-point stencils.

The reference's grid kernels read axis neighbors with `imageLoad(tex, i ± e)`;
out-of-bounds image loads return 0 under Vulkan robust buffer access, which we
model as zero fill.  All stencil stages (03, 04, 09, 12, 16, 18 in SURVEY.md
§2.4) are built from these shifts; XLA fuses the pad+slice chains into single
stencil passes.
"""

from __future__ import annotations

import jax.numpy as jnp

# Axis unit moves, same order as the reference's `moves[6]` tables
# (e.g. 03_update_air/update_active.comp:26).
MOVES = ((1, 0, 0), (0, 1, 0), (0, 0, 1), (-1, 0, 0), (0, -1, 0), (0, 0, -1))


def shifted(a: jnp.ndarray, offset, fill=0):
    """out[i] = a[i + offset], zero(fill)-padded out of bounds.

    `offset` is a length-3 int tuple; operates on the last 3 axes so it works
    for both (X,Y,Z) fields and (C,X,Y,Z) stacked components.
    """
    nd = a.ndim
    pads = [(0, 0)] * nd
    slices = [slice(None)] * nd
    for k, off in enumerate(offset):
        ax = nd - 3 + k
        n = a.shape[ax]
        if off == 0:
            continue
        if off > 0:
            pads[ax] = (0, off)
            slices[ax] = slice(off, off + n)
        else:
            pads[ax] = (-off, 0)
            slices[ax] = slice(0, n)
    if all(p == (0, 0) for p in pads):
        return a
    padded = jnp.pad(a, pads, constant_values=fill)
    return padded[tuple(slices)]


def neighbor_sum(a: jnp.ndarray, fill=0):
    """Sum of the 6 axis neighbors, zero(fill)-padded at the border."""
    out = None
    for mv in MOVES:
        s = shifted(a, mv, fill=fill)
        out = s if out is None else out + s
    return out
