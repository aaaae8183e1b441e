"""Level-set surface field (surface/levelset.py, flag-gated
beyond-reference) — the reference README's stated fix for surface holes at
high subdivision (`README.md:158-160`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.core.state import initial_state
from tpu_fluid.core.types import CellType
from tpu_fluid.solver.step import simulation_step
from tpu_fluid.stages.surface_fields import surface_field
from tpu_fluid.surface.levelset import chamfer_distance, levelset_field


def _cfg(**kw):
    d = dict(
        grid_size=(16, 16, 16),
        particle_count=4096,
        particle_init_cube_resolution=(16, 16, 16),
        particle_init_cube_offset=(3.0, 8.0, 3.0),
        particle_init_cube_size=(10.0, 5.0, 10.0),
        surface_render_resolution=2,
        jacobi_iters=20,
        advect_max_displacement=1,
    )
    d.update(kw)
    return FluidConfig(**d)


def test_chamfer_distance_exact_in_band():
    occ = jnp.zeros((16, 16, 16), jnp.uint8).at[8, 8, 8].set(1)
    phi = np.asarray(chamfer_distance(occ, sweeps=5, metric="manhattan6"))
    assert phi[8, 8, 8] == 0.0
    assert phi[9, 8, 8] == 1.0
    assert phi[9, 9, 8] == 2.0          # 6-neighbor (Manhattan) metric
    assert phi[8, 8, 13] == 5.0
    assert phi[8, 8, 14] > 100.0        # beyond the band
    # quasi-Euclidean default: diagonals use sqrt2/sqrt3 weights
    phi = np.asarray(chamfer_distance(occ, sweeps=5))
    assert phi[9, 8, 8] == 1.0
    np.testing.assert_allclose(phi[9, 9, 8], np.sqrt(2.0), rtol=1e-6)
    np.testing.assert_allclose(phi[9, 9, 9], np.sqrt(3.0), rtol=1e-6)


def test_field_sign_convention_matches_inertia_field():
    """Positive inside the fluid, negative away from it — the contract the
    marching-cubes extractor and renderers rely on."""
    cfg = _cfg(surface_method="levelset")
    occ = jnp.zeros(cfg.detailed_size, jnp.uint8)
    occ = occ.at[10:20, 10:20, 10:20].set(1)
    types = jnp.full(cfg.grid_size, CellType.INACTIVE, jnp.uint8)
    f = np.asarray(levelset_field(types, occ, cfg))
    assert f[15, 15, 15] > 0.0          # inside
    assert f[2, 2, 2] < 0.0             # far away


def _closed_surface_holes(field, cfg):
    """Count exposed boundary faces of the positive region that marching
    cubes would leave open: cells that are inside (f > 0) adjacent to
    cells also inside but disconnected... simplified: count inside cells
    with an inside 26-neighborhood yet f crossing inconsistently is hard;
    instead measure hole-ness as isolated empty cells WITHIN the fluid
    volume: inside the filled bounding region but f <= 0."""
    inside = field > 0.0
    # bounding box of the inside region
    idx = np.argwhere(inside)
    lo, hi = idx.min(0), idx.max(0) + 1
    box = inside[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]]
    # erode the box borders so only interior holes count
    core = box[2:-2, 2:-2, 2:-2]
    return int((~core).sum())


@pytest.mark.slow
def test_no_holes_at_high_subdivision():
    """At surface_render_resolution=5 (the reference's default, where it
    reports 'fluid is still full of holes'), a settled pool's interior is
    solid under the level set but has holes under the inertia field."""
    steps = 12
    holes = {}
    for method in ("inertia", "levelset"):
        cfg = _cfg(surface_render_resolution=5, surface_method=method)
        state = initial_state(cfg)
        stepf = jax.jit(simulation_step, static_argnums=1)
        for _ in range(steps):
            state = stepf(state, cfg)
        f = np.asarray(surface_field(state.float_dens_1,
                                     state.float_dens_2, cfg))
        holes[method] = _closed_surface_holes(f, cfg)
    # measured: inertia ~32000 interior holes, levelset 0 (euclid26
    # chamfer, auto iso = 1.2 * particle spacing)
    assert holes["levelset"] == 0
    assert holes["inertia"] > 1000


@pytest.mark.slow
def test_spmd_levelset_tiny_slab_matches_single_device():
    """When the chamfer band halo exceeds the local slab width (here
    lx_det = 4 < band 8), the SPMD step must fall back to the replicated
    computation instead of silently producing empty/corrupt fields (the
    bug: halo_planes returns fewer planes than requested)."""
    from tpu_fluid.parallel.mesh import make_mesh, shard_state
    from tpu_fluid.parallel.spmd_step import spmd_step

    cfg = _cfg(grid_size=(16, 16, 16), pallas_mode="off",
               surface_method="levelset", particle_count=4096,
               particle_init_cube_resolution=(16, 16, 16),
               particle_init_cube_offset=(3.0, 3.0, 3.0),
               particle_init_cube_size=(10.0, 5.0, 10.0))
    assert cfg.levelset_sweeps_value + cfg.levelset_smooth > \
        (16 // 8) * cfg.surface_render_resolution
    ref = initial_state(cfg)
    stepf = jax.jit(simulation_step, static_argnums=1)
    for _ in range(2):
        ref = stepf(ref, cfg)

    mesh = make_mesh(8)
    sharded = shard_state(initial_state(cfg), mesh)
    stepn = spmd_step(mesh, cfg, donate=False)
    for _ in range(2):
        sharded = stepn(sharded)
    a = np.asarray(jax.device_get(ref.float_dens_1))
    b = np.asarray(jax.device_get(sharded.float_dens_1))
    assert a.shape == b.shape and a.size > 0
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_spmd_levelset_matches_single_device():
    from tpu_fluid.parallel.mesh import make_mesh, shard_state
    from tpu_fluid.parallel.spmd_step import spmd_step

    cfg = _cfg(grid_size=(32, 16, 16), pallas_mode="off",
               surface_method="levelset",
               particle_init_cube_offset=(5.0, 2.0, 2.0),
               particle_init_cube_size=(20.0, 9.0, 5.0))
    ref = initial_state(cfg)
    stepf = jax.jit(simulation_step, static_argnums=1)
    for _ in range(3):
        ref = stepf(ref, cfg)

    mesh = make_mesh(8)
    sharded = shard_state(initial_state(cfg), mesh)
    stepn = spmd_step(mesh, cfg, donate=False)
    for _ in range(3):
        sharded = stepn(sharded)
    for name in ref._fields:
        a = np.asarray(jax.device_get(getattr(ref, name)))
        b = np.asarray(jax.device_get(getattr(sharded, name)))
        np.testing.assert_array_equal(a, b, err_msg=name)
