"""The strongest parity test: several FULL simulation steps (all 19 stages
composed, exact reference ordering) against the loop-based NumPy oracle on a
small scene with water, air, solids, a falling blob and an active fountain."""

import numpy as np
import jax
import jax.numpy as jnp

import oracle
from tpu_fluid.core.config import FluidConfig
from tpu_fluid.core.state import initial_state
from tpu_fluid.solver.step import simulation_step

N = 8
CFG = FluidConfig(
    grid_size=(N, N, N),
    particle_count=600,
    particle_init_cube_resolution=(9, 9, 8),
    particle_init_cube_offset=(1.5, 1.2, 1.5),
    particle_init_cube_size=(5.0, 5.2, 5.0),
    surface_render_resolution=2,
    jacobi_iters=12,
    fountain_force=-800.0,
)


def oracle_step(state_np, cfg):
    """One full frame in the oracle, stage order per
    fluid_flow_sections.h:159-391 (SURVEY.md §3.2)."""
    (vel, types, inertia, f1, f2, pos, act) = state_np
    dens = oracle.histogram(pos, act, cfg.grid_size)
    new_types = oracle.update_air(oracle.update_water(dens))
    ext = oracle.compute_extrapolated(types, vel)
    vel = oracle.set_extrapolated(types, new_types, vel, ext)
    types = new_types
    vel = oracle.advect(types, vel, cfg.dt)
    vel = oracle.forces(types, vel, cfg.dt, cfg.gravity, cfg.fountain,
                        cfg.fountain_force)
    vel = oracle.diffuse(types, vel, cfg.dt, cfg.diffusion_coefficient,
                         noop=cfg.reference_diffuse_noop)
    vel = oracle.solids(types, vel, cfg.solid_repel_velocity)
    div = oracle.divergence(vel)
    p = oracle.jacobi(types, div, cfg.jacobi_iters - 1, cfg.dt,
                      cfg.air_pressure, cfg.cell_width, cfg.fluid_density)
    vel = oracle.fix_divergence(types, p, vel, cfg.dt, cfg.cell_width,
                                cfg.fluid_density)
    pos = oracle.move_particles(vel, pos, act, cfg.dt)
    ddens = oracle.histogram(pos, act, cfg.detailed_size,
                             scale=cfg.surface_render_resolution)
    inertia = oracle.update_inertia(
        ddens, inertia, cfg.max_inertia, cfg.inertia_increase_filled,
        cfg.inertia_required_neighbour_hits, cfg.inertia_increase_neighbour,
        cfg.inertia_decrease)
    f1 = oracle.float_densities(inertia,
                                cfg.float_density_division_coefficient)
    f1, f2 = oracle.blur_float_densities(
        types, f1, f2, cfg.float_density_diffuse_steps,
        cfg.float_density_diffuse_coefficient, cfg.surface_render_resolution)
    return (vel, types, inertia, f1, f2, pos, act)


def test_three_full_steps_match_oracle():
    state = initial_state(CFG)
    s_np = (
        np.asarray(state.velocity, dtype=np.float64),
        np.asarray(state.cell_types),
        np.asarray(state.inertia).astype(np.int64),
        np.asarray(state.float_dens_1, dtype=np.float64),
        np.asarray(state.float_dens_2, dtype=np.float64),
        np.asarray(state.positions, dtype=np.float64),
        np.asarray(state.active),
    )
    step = jax.jit(simulation_step, static_argnums=1, donate_argnums=0)
    for k in range(3):
        state = step(state, CFG)
        s_np = oracle_step(s_np, CFG)
        vel, types, inertia, f1, f2, pos, act = s_np
        np.testing.assert_array_equal(np.asarray(state.cell_types), types,
                                      err_msg=f"step {k} cell_types")
        np.testing.assert_allclose(np.asarray(state.velocity), vel,
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"step {k} velocity")
        np.testing.assert_allclose(np.asarray(state.positions), pos,
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"step {k} positions")
        np.testing.assert_array_equal(np.asarray(state.inertia), inertia,
                                      err_msg=f"step {k} inertia")
        np.testing.assert_allclose(np.asarray(state.float_dens_1), f1,
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"step {k} float_dens_1")
        np.testing.assert_allclose(np.asarray(state.float_dens_2), f2,
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"step {k} float_dens_2")
