"""Red-black Gauss-Seidel pressure solver (flag-gated beyond-reference
alternative; plain Jacobi stays the default for reference parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.core.state import initial_state
from tpu_fluid.core.types import CellType
from tpu_fluid.solver.step import simulation_step
from tpu_fluid.stages import pressure


def _cfg(**kw):
    d = dict(
        grid_size=(24, 24, 24),
        particle_count=16384,
        particle_init_cube_resolution=(32, 16, 32),
        particle_init_cube_offset=(4.0, 12.0, 4.0),
        particle_init_cube_size=(16.0, 8.0, 16.0),
        surface_render_resolution=2,
        jacobi_iters=200,
        advect_max_displacement=1,
    )
    d.update(kw)
    return FluidConfig(**d)


def _residual(types, div, p, cfg):
    """max |A p - b| over the update cells of the stage-12 system."""
    water, aii, n_air = pressure.jacobi_stats(types, cfg)
    b = np.asarray(div) * (cfg.fluid_density * cfg.cell_width / cfg.dt)
    pw = jnp.where(water, p, 0.0)
    neigh = jnp.zeros_like(p)
    from tpu_fluid.ops.stencil import MOVES, shifted
    for mv in MOVES:
        neigh = neigh + shifted(pw, mv)
    r = neigh + n_air * cfg.air_pressure - b - aii * p
    upd = np.asarray(water & (aii > 0))
    return float(np.abs(np.asarray(r))[upd].max())


def _setup(cfg):
    state = initial_state(cfg)
    stepf = jax.jit(simulation_step, static_argnums=1)
    for _ in range(10):
        state = stepf(state, cfg)
    types = state.cell_types
    div = pressure.compute_divergence(state.velocity)
    return types, div


def test_redblack_converges_faster_per_sweep():
    cfg = _cfg(pallas_mode="off")
    types, div = _setup(cfg)

    cfg_j = cfg.replace(jacobi_iters=200, reference_pressure_parity=False)
    cfg_rb = cfg_j.replace(pressure_solver="redblack", jacobi_iters=100)

    p_j = pressure.jacobi_solve(types, div, cfg_j)
    p_rb = pressure.jacobi_solve(types, div, cfg_rb)

    r_j = _residual(types, div, p_j, cfg)
    r_rb = _residual(types, div, p_rb, cfg)
    # 100 red-black sweeps match/beat 200 plain Jacobi sweeps on
    # residual (measured: 1.43e-6 both at 24^3 after 10 steps)
    assert r_rb <= r_j


def test_redblack_full_step_runs_and_projects():
    """A full step with the red-black solver produces a comparably
    divergence-free field."""
    from tpu_fluid.utils.diagnostics import diagnostics

    outs = {}
    for solver, iters in (("jacobi", 200), ("redblack", 100)):
        cfg = _cfg(pressure_solver=solver, jacobi_iters=iters,
                   reference_pressure_parity=False)
        state = initial_state(cfg)
        stepf = jax.jit(simulation_step, static_argnums=1)
        for _ in range(10):
            state = stepf(state, cfg)
        d = diagnostics(state, cfg)
        outs[solver] = float(d["div_water_max"])
        assert np.isfinite(np.asarray(state.positions)).all()
    # both ~1e-6; small safety factor for trajectory divergence
    assert outs["redblack"] <= 3.0 * outs["jacobi"]


def test_spmd_redblack_matches_single_device():
    from tpu_fluid.parallel.mesh import make_mesh, shard_state
    from tpu_fluid.parallel.spmd_step import spmd_step

    cfg = _cfg(grid_size=(32, 16, 16), pallas_mode="off",
               pressure_solver="redblack", jacobi_iters=30,
               particle_count=4096,
               particle_init_cube_resolution=(16, 16, 16),
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
