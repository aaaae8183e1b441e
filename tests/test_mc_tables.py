"""Marching-cubes table + extraction tests: topological consistency
(watertightness), orientation, and parity with the reference's per-cell
emission contract (<= 5 triangles, zero-crossing interpolation)."""

import numpy as np
import jax.numpy as jnp

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.surface.mc_tables import (CORNERS, EDGES, MAX_TRIS, TRI_COUNTS,
                                         TRI_EDGES)
from tpu_fluid.surface.marching_cubes import extract_surface, mesh_to_numpy

CFG = FluidConfig(grid_size=(8, 8, 8), surface_render_resolution=2,
                  jacobi_iters=5)


def test_table_shape_and_bounds():
    assert TRI_COUNTS.shape == (256,)
    assert MAX_TRIS <= 5          # same capacity as the reference geometry
    assert TRI_COUNTS.max() == MAX_TRIS
    assert TRI_COUNTS[0] == 0 and TRI_COUNTS[255] == 0
    # all used entries are valid edge ids
    for cfgi in range(256):
        used = TRI_EDGES[cfgi][:3 * TRI_COUNTS[cfgi]]
        assert ((used >= 0) & (used < 12)).all()
        assert (TRI_EDGES[cfgi][3 * TRI_COUNTS[cfgi]:] == 255).all()


def test_table_single_corner_configs():
    """The 8 single-positive-corner configs are single triangles on the three
    edges incident to that corner."""
    for c in range(8):
        cfgi = 1 << c
        assert TRI_COUNTS[cfgi] == 1
        used = set(TRI_EDGES[cfgi][:3].tolist())
        incident = {e for e, (a, b) in enumerate(EDGES) if c in (a, b)}
        assert used == incident


def _field(fn, n=12):
    x, y, z = np.meshgrid(*[np.arange(n)] * 3, indexing="ij")
    return fn(x, y, z).astype(np.float32)


def _extract(field):
    cfg = CFG
    mesh = extract_surface(jnp.asarray(field), cfg, max_cells=8192)
    return mesh_to_numpy(mesh)


def _edge_key(v0, v1):
    return tuple(sorted([tuple(np.round(v0, 5)), tuple(np.round(v1, 5))]))


def _check_watertight(tris):
    """Every undirected edge must appear exactly twice (closed surface)."""
    from collections import Counter
    cnt = Counter()
    for t in tris:
        for i in range(3):
            cnt[_edge_key(t[i], t[(i + 1) % 3])] += 1
    bad = {k: v for k, v in cnt.items() if v != 2}
    assert not bad, f"{len(bad)} non-manifold edges of {len(cnt)}"


def test_sphere_watertight_and_oriented():
    c, r = 5.5, 3.2
    f = _field(lambda x, y, z: r**2 - ((x - c)**2 + (y - c)**2 + (z - c)**2))
    tris, normals = _extract(f)
    assert len(tris) > 50
    _check_watertight(tris)
    # orientation: normals point away from the sphere center (inside > 0)
    centers = tris.mean(axis=1)
    centroid = np.array([c, c, c]) / CFG.surface_render_resolution
    outward = centers - centroid
    dots = (normals * outward).sum(-1)
    assert (dots > 0).mean() > 0.99
    # signed volume via divergence theorem ~ sphere volume
    v0, v1, v2 = tris[:, 0], tris[:, 1], tris[:, 2]
    vol = np.abs((np.cross(v1 - v0, v2 - v0) * v0).sum() / 6.0)
    expect = 4 / 3 * np.pi * (r / CFG.surface_render_resolution) ** 3
    assert abs(vol - expect) / expect < 0.15


def test_random_smooth_field_watertight():
    r = np.random.default_rng(0)
    base = r.standard_normal((5, 5, 5))
    # upsample to 12^3 smoothly; negative border so the surface closes
    from numpy import linspace
    idx = linspace(0, 4, 12)
    f = base
    for ax in range(3):
        f = np.apply_along_axis(
            lambda v: np.interp(idx, np.arange(5), v), ax, f)
    x, y, z = np.meshgrid(*[np.arange(12)] * 3, indexing="ij")
    border = np.minimum.reduce([x, y, z, 11 - x, 11 - y, 11 - z])
    f = np.where(border == 0, -1.0, f).astype(np.float32)
    tris, _ = _extract(f)
    assert len(tris) > 20
    _check_watertight(tris)


def test_alpha_interpolation_position():
    """A flat isosurface between two z-planes must land at the exact
    zero-crossing height (d0/(d0-d1) rule, render_surface.geom:66)."""
    n = 8
    zplane = 3.25
    f = _field(lambda x, y, z: (zplane - z))
    tris, _ = _extract(f)
    assert len(tris) > 0
    zs = tris[..., 2].ravel()
    np.testing.assert_allclose(
        zs, (0.5 + zplane) / CFG.surface_render_resolution, atol=1e-5)


def test_empty_and_full_fields():
    for fill in (-1.0, 1.0):
        f = np.full((10, 10, 10), fill, dtype=np.float32)
        tris, _ = _extract(f)
        assert len(tris) == 0
