"""Multi-device tests on the virtual 8-device CPU mesh: the sharded step must
match the single-device step."""

import numpy as np
import jax
import pytest

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.core.state import initial_state
from tpu_fluid.parallel.mesh import make_mesh, shard_state, state_shardings
from tpu_fluid.parallel.sharded import sharded_step
from tpu_fluid.solver.step import simulation_step

CFG = FluidConfig(
    grid_size=(16, 16, 16),
    particle_count=4096,
    particle_init_cube_resolution=(16, 16, 16),
    particle_init_cube_offset=(2.0, 2.0, 2.0),
    particle_init_cube_size=(8.0, 8.0, 8.0),
    surface_render_resolution=2,
    jacobi_iters=20,
    advect_max_displacement=1,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


def test_sharded_step_matches_single(mesh):
    state0 = initial_state(CFG)
    single = jax.jit(simulation_step, static_argnums=1)
    s_ref = state0
    for _ in range(3):
        s_ref = single(s_ref, CFG)

    s_sh = shard_state(state0, mesh)
    step = sharded_step(mesh, CFG, donate=False)
    for _ in range(3):
        s_sh = step(s_sh)

    # integer/bool state leaves must match BITWISE (SURVEY.md §4's bar);
    # float leaves tightly (GSPMD may reorder FP sums across partitions)
    int_leaves = ("cell_types", "inertia", "active", "detailed_occ", "step")
    for name, a, b in zip(s_ref._fields, jax.tree.leaves(s_ref),
                          jax.tree.leaves(s_sh)):
        a = np.asarray(a)
        b = np.asarray(jax.device_get(b))
        if name in int_leaves:
            np.testing.assert_array_equal(a, b, err_msg=f"leaf {name}")
        else:
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6,
                                       err_msg=f"leaf {name}")


def test_sharded_layout_preserved(mesh):
    state0 = shard_state(initial_state(CFG), mesh)
    step = sharded_step(mesh, CFG, donate=False)
    out = step(state0)
    want = state_shardings(mesh)
    assert out.velocity.sharding.is_equivalent_to(
        want.velocity, out.velocity.ndim)
    assert out.positions.sharding.is_equivalent_to(
        want.positions, out.positions.ndim)


def test_sharded_run_to_run_determinism(mesh):
    """Two independent sharded runs are bitwise identical (integer scatter
    adds; no RNG anywhere) — SURVEY.md §4's determinism bar."""
    from tpu_fluid.parallel.spmd_step import spmd_step
    outs = []
    for _ in range(2):
        s = shard_state(initial_state(CFG), mesh)
        step = spmd_step(mesh, CFG, donate=False)
        for _ in range(3):
            s = step(s)
        outs.append(s)
    for name, a, b in zip(outs[0]._fields, jax.tree.leaves(outs[0]),
                          jax.tree.leaves(outs[1])):
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(a)), np.asarray(jax.device_get(b)),
            err_msg=f"leaf {name}")


@pytest.mark.slow
def test_graft_dryrun():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
