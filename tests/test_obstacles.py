"""Static obstacle boxes: marked SOLID, repel fluid, block particles."""

import numpy as np
import jax

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.core.state import initial_state
from tpu_fluid.core.types import CellType
from tpu_fluid.solver.step import simulation_step

CFG = FluidConfig(
    grid_size=(14, 14, 14),
    particle_count=4000,
    particle_init_cube_resolution=(16, 16, 16),
    particle_init_cube_offset=(3.0, 1.5, 3.0),
    particle_init_cube_size=(8.0, 5.0, 8.0),
    surface_render_resolution=2,
    jacobi_iters=40,
    fountain_force=0.0,
    solid_boxes=(((4, 9, 4), (10, 11, 10)),),   # a shelf under the water
)


def test_obstacle_cells_marked_solid():
    state = initial_state(CFG)
    step = jax.jit(simulation_step, static_argnums=1)
    state = step(state, CFG)
    t = np.asarray(state.cell_types)
    assert (t[4:10, 9:11, 4:10] == CellType.SOLID).all()


def test_particles_do_not_enter_obstacle():
    state = initial_state(CFG)
    step = jax.jit(simulation_step, static_argnums=1)
    for _ in range(40):
        state = step(state, CFG)
    pos = np.asarray(state.positions)[np.asarray(state.active)]
    # count particles strictly inside the obstacle interior (allow the
    # boundary layer: the reference's repel scheme lets particles graze
    # solid-cell faces)
    inside = ((pos[:, 0] > 5.0) & (pos[:, 0] < 9.0)
              & (pos[:, 1] > 9.5) & (pos[:, 1] < 10.5)
              & (pos[:, 2] > 5.0) & (pos[:, 2] < 9.0))
    assert inside.sum() <= 2, f"{inside.sum()} particles inside obstacle"
    # water piles on top of the shelf: some particles rest just above it
    on_shelf = ((pos[:, 0] > 4) & (pos[:, 0] < 10)
                & (pos[:, 1] > 7.0) & (pos[:, 1] < 9.0)
                & (pos[:, 2] > 4) & (pos[:, 2] < 10))
    assert on_shelf.sum() > 0


def test_extra_forces():
    """Configurable side-jet force accelerates wet cells along +x."""
    import jax.numpy as jnp
    from tpu_fluid.stages import velocity as vstages
    cfg = CFG.replace(extra_forces=(((7, 5, 7), (500.0, 0.0, 0.0)),),
                      solid_boxes=())
    # make the jet cell wet
    state = initial_state(cfg)
    step = jax.jit(simulation_step, static_argnums=1)
    s = step(state, cfg)
    t = np.asarray(s.cell_types)
    if t[7, 5, 7] == CellType.WATER or t[6, 5, 7] == CellType.WATER:
        vx = np.asarray(s.velocity[0])
        assert vx[7, 5, 7] > 1.0
    # direct unit check regardless of scene wetness
    types = jnp.full(cfg.grid_size, CellType.WATER, jnp.uint8)
    vel = jnp.zeros((3,) + cfg.grid_size, jnp.float32)
    out = vstages.apply_forces(types, vel, cfg)
    assert float(out[0, 7, 5, 7]) == 500.0 * cfg.dt
    assert float(out[0, 7, 5, 8]) == 0.0
