"""Particle-to-grid scatter (histogram) ops.

Replaces the reference's `imageAtomicAdd` scatter kernels
(`01_update_densities/update_densities.comp:29-36`,
`15_update_detailed_densities/update_detailed_densities.comp:24-32`).  The
reference's adds are integer atomics, so it is order-deterministic; on TPU the
functional scatter-add is deterministic by construction and we assert bitwise
stability in tests.

Cell index = integer truncation of the particle position (GLSL `ivec3(pos)`
truncates toward zero).  Out-of-range indices are dropped, matching GLSL
robust-access behavior for OOB `imageAtomicAdd`.
"""

from __future__ import annotations

import jax.numpy as jnp


def particle_cell_histogram(positions: jnp.ndarray, active: jnp.ndarray,
                            grid_size, scale: float = 1.0) -> jnp.ndarray:
    """Count active particles per cell of a grid.

    positions: (P,3) float; active: (P,) bool; grid_size: (X,Y,Z).
    scale: position multiplier before truncation (detailed_resolution for the
    surface grid, 1 for the sim grid).
    Returns (X,Y,Z) int32 counts.
    """
    gx, gy, gz = grid_size
    p = positions if scale == 1.0 else positions * scale
    idx = jnp.trunc(p).astype(jnp.int32)
    x, y, z = idx[..., 0], idx[..., 1], idx[..., 2]
    inb = ((x >= 0) & (x < gx) & (y >= 0) & (y < gy) & (z >= 0) & (z < gz)
           & active)
    flat = (x * (gy * gz) + y * gz + z)
    # Route dropped particles to index 0 with weight 0 rather than relying on
    # OOB-drop: keeps the scatter shape static and branch-free.
    flat = jnp.where(inb, flat, 0)
    counts = jnp.zeros((gx * gy * gz,), dtype=jnp.int32)
    counts = counts.at[flat].add(inb.astype(jnp.int32))
    return counts.reshape(gx, gy, gz)
