"""Scene presets, debug density view, GIF export."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpu_fluid.core.scenes import SCENES, dam_break, drop
from tpu_fluid.core.state import initial_state
from tpu_fluid.core.types import CellType
from tpu_fluid.solver.step import simulation_step
from tpu_fluid.render.camera import Camera
from tpu_fluid.render.debug import render_cell_field
from tpu_fluid.render.export import write_gif


@pytest.mark.slow
def test_scene_presets_run():
    for name, factory in SCENES.items():
        cfg = factory(12, particle_count=2000)
        state = initial_state(cfg)
        state = jax.jit(simulation_step, static_argnums=1)(state, cfg)
        assert int(state.step) == 1, name
        assert int(state.active.sum()) > 0, name


def test_dam_break_collapses():
    cfg = dam_break(12, particle_count=3000).replace(jacobi_iters=40)
    state = initial_state(cfg)
    x_extent_0 = float(np.asarray(state.positions)[:, 0].max())
    # 2 sim-seconds (gravity 10, dt 0.01): ample time for the column to slump
    from tpu_fluid.solver.step import jit_multi_step
    state = jit_multi_step(state, cfg, 200)
    pos = np.asarray(state.positions)[np.asarray(state.active)]
    # the column spreads along x as it collapses
    assert pos[:, 0].max() > x_extent_0 + 1.0


def test_drop_scene_has_two_bodies():
    """The drop preset is a cube ABOVE a floor pool — two disjoint particle
    bodies at t=0 (multi-blob init, generalizing
    `00_init_particles/init_particles.comp:36-49`)."""
    cfg = drop(20, particle_count=10_000)
    assert cfg.extra_particle_cubes  # the pool
    state = initial_state(cfg)
    pos = np.asarray(state.positions)[np.asarray(state.active)]
    y = pos[:, 1]
    # +y is down: the cube occupies y in [3, 9], the pool y in [16.5, 19]
    cube = y < 10.0
    pool = y > 15.0
    assert cube.sum() > 1000 and pool.sum() > 1000
    assert cube.sum() + pool.sum() == len(y)  # nothing in the gap


def test_multi_cube_ids_are_consecutive():
    """Cube k occupies particle ids [sum vols(<k), +vol_k); leftovers are
    inactive — the reference's id rule generalized."""
    from tpu_fluid.core.config import FluidConfig
    cfg = FluidConfig(
        grid_size=(12, 12, 12), particle_count=100,
        particle_init_cube_resolution=(3, 3, 3),
        particle_init_cube_offset=(2.0, 2.0, 2.0),
        particle_init_cube_size=(2.0, 2.0, 2.0),
        extra_particle_cubes=(((2, 2, 2), (8.0, 8.0, 8.0),
                               (1.5, 1.5, 1.5)),),
        surface_render_resolution=2)
    from tpu_fluid.core.state import init_particles
    pos, active = init_particles(cfg)
    active = np.asarray(active)
    assert active[:27].all() and active[27:35].all()
    assert not active[35:].any()
    p = np.asarray(pos)
    assert (p[:27] < 5.0).all()       # first cube near (2,2,2)
    assert (p[27:35] >= 8.0).all()    # second near (8,8,8)


def test_single_cube_matches_reference_math():
    """With no extra cubes the generalized initializer reproduces the exact
    single-cube reference math (oracle-pinned elsewhere; bitwise here)."""
    from tpu_fluid.core.config import FluidConfig
    from tpu_fluid.core.state import init_particles
    cfg = FluidConfig(grid_size=(12, 12, 12), particle_count=50,
                      particle_init_cube_resolution=(3, 3, 3),
                      particle_init_cube_offset=(2.0, 2.0, 2.0),
                      particle_init_cube_size=(2.0, 2.0, 2.0),
                      surface_render_resolution=2)
    pos, active = init_particles(cfg)
    ids = np.arange(50)
    exp_active = ids < 27
    np.testing.assert_array_equal(np.asarray(active), exp_active)
    x, y, z = ids % 3, (ids // 3) % 3, (ids // 9) % 3
    idx = np.stack([x, y, z], -1).astype(np.float32)
    exp = np.float32(2.0) + idx / np.float32(3.0) * np.float32(2.0)
    np.testing.assert_array_equal(np.asarray(pos)[:27], exp[:27])


def test_dam_break_obstacle_scene():
    """The obstacle preset marks its pillar SOLID and still runs."""
    from tpu_fluid.core.scenes import dam_break_obstacle
    cfg = dam_break_obstacle(12, particle_count=2000)
    assert cfg.solid_boxes
    state = initial_state(cfg)
    state = jax.jit(simulation_step, static_argnums=1)(state, cfg)
    types = np.asarray(state.cell_types)
    (x0, y0, z0), (x1, y1, z1) = cfg.solid_boxes[0]
    assert (types[x0:x1, y0:y1, z0:z1] == CellType.SOLID).all()


def test_debug_density_view():
    cfg = drop(12, particle_count=3000)
    state = initial_state(cfg)
    from tpu_fluid.stages.particles import particle_densities
    dens = particle_densities(state.positions, state.active, cfg)
    img = np.asarray(render_cell_field(
        dens, Camera.for_scene(cfg.grid_size).mvp(), cfg, 96, 96))
    assert img.shape == (96, 96, 3)
    # blue -> red colormap: occupied cells visible with nonzero blue or red
    assert ((img[..., 0] > 0) | (img[..., 2] > 0)).any()
    assert (img[..., 1] == 0).all()


def test_gif_export(tmp_path):
    frames = [np.full((8, 8, 3), v, dtype=np.uint8) for v in (0, 128, 255)]
    path = str(tmp_path / "anim.gif")
    write_gif(path, frames, fps=10)
    assert os.path.getsize(path) > 100
    from PIL import Image
    im = Image.open(path)
    assert im.n_frames == 3
