"""Clamped halo-block index maps, shared by every direct-halo kernel.

The direct-halo technique (first built for the Jacobi slab kernel, then
retrofitted across surface_fused / grid_fused / pack_table) reads a
block's +-1 neighbor halos straight out of the unpadded field arrays via
*clamped* block-index maps instead of materializing padded copies or halo
tensors.  The subtle part — shared here so a fix lands everywhere — is the
arithmetic, in halo-row block units of size h where h | tx (r0 = tx // h
halo-units per tile):

- left halo of tile b  = halo-unit max(b * r0 - 1, 0)
- right halo of tile b = halo-unit min((b + 1) * r0, last),
  last = (axis_len // h) - 1

At the domain ends the clamp re-reads an in-domain block instead of
running off the array; the kernels then mask those rows back to each
caller's boundary convention (zero-pad for jacobi/grid/surface via in-dom
masks, replicate-edge for pack_table, where the clamp alone IS the
convention and no masking happens).
"""

from __future__ import annotations

import jax.numpy as jnp


def clamped_halo_maps(r0: int, last: int):
    """Return (lo, hi): per-axis halo-unit offset functions for tile index
    b — lo(b)/hi(b) address the halo block just left/right of tile b,
    clamped into [0, last].  Compose them into BlockSpec index maps, e.g.
    ``lambda i: (lo(i), 0, 0)`` or 2D ``lambda i, j: (lo(i), yhi(j), 0)``."""
    return (lambda b: jnp.maximum(b * r0 - 1, 0),
            lambda b: jnp.minimum((b + 1) * r0, last))
