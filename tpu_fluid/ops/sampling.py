"""Staggered trilinear velocity sampling.

Reproduces the reference's sampler contract exactly (trilinear filtering,
normalized coordinates, clamp-to-edge — `fluid_flow_sections.h:94-95`) and its
staggered access scheme: component c of the MAC velocity lives at the center
of the cell's lower face in dim c, so sampling component c at world position p
reads the texture at normalized `(p + 0.5*e_c) / fluid_size`
(`07_advect/advect.comp:37-59`, `14_particles/particles.comp:28-40`).

GLSL `texture()` maps normalized coordinate u to texel space t = u*N - 0.5 and
lerps the two nearest texels with clamp-to-edge; in texel space the staggered
sample point for component c is therefore `p - 0.5 + 0.5*e_c`.
"""

from __future__ import annotations

import jax.numpy as jnp


def trilinear(field: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Trilinear clamp-to-edge sample of `field` (X,Y,Z) at texel coords
    `t` (..., 3).  Index clipping reproduces GLSL clamp-to-edge: at/outside the
    border both lerp endpoints collapse to the edge texel."""
    shape = jnp.array(field.shape, dtype=t.dtype)
    i0f = jnp.floor(t)
    w = t - i0f                                   # lerp weights in [0,1)
    i0 = jnp.clip(i0f.astype(jnp.int32), 0, shape.astype(jnp.int32) - 1)
    i1 = jnp.clip(i0f.astype(jnp.int32) + 1, 0, shape.astype(jnp.int32) - 1)

    x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
    x1, y1, z1 = i1[..., 0], i1[..., 1], i1[..., 2]
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]

    c000 = field[x0, y0, z0]
    c100 = field[x1, y0, z0]
    c010 = field[x0, y1, z0]
    c110 = field[x1, y1, z0]
    c001 = field[x0, y0, z1]
    c101 = field[x1, y0, z1]
    c011 = field[x0, y1, z1]
    c111 = field[x1, y1, z1]

    c00 = c000 * (1 - wx) + c100 * wx
    c10 = c010 * (1 - wx) + c110 * wx
    c01 = c001 * (1 - wx) + c101 * wx
    c11 = c011 * (1 - wx) + c111 * wx
    c0 = c00 * (1 - wy) + c10 * wy
    c1 = c01 * (1 - wy) + c11 * wy
    return c0 * (1 - wz) + c1 * wz


def velocity_component_at(vel: jnp.ndarray, pos: jnp.ndarray,
                          comp: int) -> jnp.ndarray:
    """Sample staggered component `comp` of `vel` (3,X,Y,Z) at world
    positions `pos` (...,3).  Texel coords = pos - 0.5 + 0.5*e_comp."""
    half = jnp.zeros((3,), dtype=pos.dtype).at[comp].set(0.5)
    t = pos - 0.5 + half
    return trilinear(vel[comp], t)


def velocity_at(vel: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Sample the full staggered velocity vector at world positions
    `pos` (...,3); returns (...,3)."""
    return jnp.stack(
        [velocity_component_at(vel, pos, c) for c in range(3)], axis=-1)
