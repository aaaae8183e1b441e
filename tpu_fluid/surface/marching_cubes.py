"""Device-side marching-cubes surface extraction.

Replaces the reference's geometry-shader marching cubes
(`31_render_surface/render_surface.geom:84-102`): one point per detailed cell
of (D-1)^3, 8 corner loads, an 8-bit configuration, table lookups, and <= 5
emitted triangles with zero-crossing interpolation
`a = d0 / (d0 - d1)` and world position `(0.5 + pos + corner + edge*a) /
detailed_resolution` (`render_surface.geom:55-81`).

XLA needs static shapes, so variable triangle counts become:
  config grid -> jnp.nonzero(size=max_cells) compaction of surface cells ->
  fixed (max_cells, MAX_TRIS) triangle slots with a validity mask.
`max_cells` bounds the number of surface-crossing cells (the fluid's surface
area in detailed cells), not the volume.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.surface.mc_tables import (CORNERS, EDGES, MAX_TRIS, TRI_COUNTS,
                                         TRI_EDGES)


class SurfaceMesh(NamedTuple):
    """Fixed-capacity triangle soup (world space) + validity mask."""
    vertices: jnp.ndarray   # (max_cells * MAX_TRIS, 3, 3) float32
    normals: jnp.ndarray    # (max_cells * MAX_TRIS, 3) float32 (flat)
    valid: jnp.ndarray      # (max_cells * MAX_TRIS,) bool
    count: jnp.ndarray      # () int32 — number of valid triangles


def default_max_cells(cfg: FluidConfig) -> int:
    """Default surface-cell budget: ~6 faces of a cube with the fluid's
    volume in detailed cells, with generous headroom."""
    dx, dy, dz = cfg.detailed_size
    side = max(dx, dy, dz)
    return min(dx * dy * dz, max(4096, 8 * side * side))


def extract_surface(field: jnp.ndarray, cfg: FluidConfig,
                    max_cells: int | None = None) -> SurfaceMesh:
    """field: (DX, DY, DZ) signed density (positive inside).  Returns the
    triangle soup of the 0-isosurface over the (DX-1, DY-1, DZ-1) cell grid.
    """
    if max_cells is None:
        max_cells = default_max_cells(cfg)
    dx, dy, dz = field.shape
    cx, cy, cz = dx - 1, dy - 1, dz - 1

    inside = field > 0
    config = jnp.zeros((cx, cy, cz), dtype=jnp.int32)
    for i, (ox, oy, oz) in enumerate(np.asarray(CORNERS)):
        bit = inside[ox:ox + cx, oy:oy + cy, oz:oz + cz]
        config = config | (bit.astype(jnp.int32) << i)

    counts_tab = jnp.asarray(TRI_COUNTS)
    edges_tab = jnp.asarray(TRI_EDGES)

    ntri = jnp.take(counts_tab, config.ravel())
    surface = ntri > 0
    count_cells = surface.sum()
    (cell_ids,) = jnp.nonzero(surface, size=max_cells, fill_value=0)
    cell_valid = (jnp.arange(max_cells) < count_cells)

    # cell coords + per-cell corner densities (8 scalar gathers on the
    # compacted cells only)
    px = cell_ids // (cy * cz)
    py = (cell_ids // cz) % cy
    pz = cell_ids % cz
    ffield = field.ravel()
    dens = []
    for (ox, oy, oz) in np.asarray(CORNERS):
        fidx = (px + ox) * (dy * dz) + (py + oy) * dz + (pz + oz)
        dens.append(jnp.take(ffield, fidx))
    dens = jnp.stack(dens, axis=-1)                       # (K, 8)

    cfg_k = jnp.take(config.ravel(), cell_ids)            # (K,)
    ntri_k = jnp.take(counts_tab, cfg_k)
    tri_edge = jnp.take(edges_tab, cfg_k, axis=0)         # (K, 3*MAX_TRIS)
    tri_edge = tri_edge.reshape(-1, MAX_TRIS, 3)
    tri_edge_safe = jnp.where(tri_edge == 255, 0, tri_edge)

    ea = jnp.take(jnp.asarray(EDGES[:, 0]), tri_edge_safe)  # (K, MT, 3)
    eb = jnp.take(jnp.asarray(EDGES[:, 1]), tri_edge_safe)
    d0 = jnp.take_along_axis(dens[:, None, :].repeat(MAX_TRIS, 1), ea,
                             axis=-1)
    d1 = jnp.take_along_axis(dens[:, None, :].repeat(MAX_TRIS, 1), eb,
                             axis=-1)
    alpha = d0 / (d0 - d1)                                # (K, MT, 3)

    corners = jnp.asarray(CORNERS.astype(np.float32))     # (8, 3)
    ca = jnp.take(corners, ea, axis=0)                    # (K, MT, 3, 3)
    cb = jnp.take(corners, eb, axis=0)
    cell_pos = jnp.stack([px, py, pz], axis=-1).astype(jnp.float32)
    # world position, exactly the reference formula (render_surface.geom:69)
    verts = (0.5 + cell_pos[:, None, None, :] + ca
             + (cb - ca) * alpha[..., None]) / cfg.surface_render_resolution

    n = jnp.cross(verts[:, :, 1] - verts[:, :, 0],
                  verts[:, :, 2] - verts[:, :, 0])
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-20)

    slot = jnp.arange(MAX_TRIS)[None, :]
    tri_valid = cell_valid[:, None] & (slot < ntri_k[:, None])

    total = tri_valid.sum()
    return SurfaceMesh(
        vertices=verts.reshape(-1, 3, 3),
        normals=n.reshape(-1, 3),
        valid=tri_valid.reshape(-1),
        count=total.astype(jnp.int32),
    )


def mesh_to_numpy(mesh: SurfaceMesh):
    """Compact a device SurfaceMesh into host numpy arrays
    (tris (T,3,3), normals (T,3))."""
    valid = np.asarray(mesh.valid)
    return (np.asarray(mesh.vertices)[valid],
            np.asarray(mesh.normals)[valid])
