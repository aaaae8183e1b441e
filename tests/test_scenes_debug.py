"""Scene presets, debug density view, GIF export."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from tpu_fluid.core.scenes import SCENES, dam_break, drop
from tpu_fluid.core.state import initial_state
from tpu_fluid.core.types import CellType
from tpu_fluid.solver.step import simulation_step
from tpu_fluid.render.camera import Camera
from tpu_fluid.render.debug import render_cell_field
from tpu_fluid.render.export import write_gif


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
