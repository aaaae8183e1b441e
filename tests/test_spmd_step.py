"""Explicit SPMD step (shard_map + ppermute halos) vs the single-device
step, on the 8-way virtual CPU mesh.

Two dispatch modes are pinned:
  - pallas_mode="off":        XLA stage formulations under shard_map
  - pallas_mode="interpret":  the REAL Pallas kernels (K-fused Jacobi,
    fused advect, packed-table build + sample) running through the Pallas
    interpreter inside shard_map — the exact code path a real multi-chip
    TPU run takes, minus only Mosaic codegen.

Integer/bool state leaves must match BITWISE; float leaves are compared
exactly too (the sharded math performs the same per-cell operations in the
same order), with the assertion split so any future drift is attributable.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.core.state import initial_state
from tpu_fluid.parallel.mesh import make_mesh, shard_state
from tpu_fluid.parallel.spmd_step import (spmd_multi_step, spmd_step,
                                          validate_spmd_config)
from tpu_fluid.solver.step import simulation_step

INT_LEAVES = ("cell_types", "inertia", "active", "detailed_occ", "step")


def base_cfg(**kw):
    d = dict(
        grid_size=(32, 16, 16),   # non-cubic; x-slabs of width 4 on 8 shards
        particle_count=4096,
        particle_init_cube_resolution=(16, 16, 16),
        particle_init_cube_offset=(5.0, 2.0, 2.0),
        particle_init_cube_size=(20.0, 9.0, 5.0),
        surface_render_resolution=2,
        jacobi_iters=30,
        advect_max_displacement=2,
    )
    d.update(kw)
    return FluidConfig(**d)


def run_both(cfg, n_steps=3):
    """(single-device final state, sharded final state)."""
    mesh = make_mesh(8)
    state0 = initial_state(cfg)
    ref = state0
    step1 = jax.jit(simulation_step, static_argnums=1)
    for _ in range(n_steps):
        ref = step1(ref, cfg)

    sharded = shard_state(initial_state(cfg), mesh)
    stepn = spmd_step(mesh, cfg, donate=False)
    for _ in range(n_steps):
        sharded = stepn(sharded)
    return ref, sharded


def assert_states_match(ref, sharded, float_exact=True):
    for name in ref._fields:
        a = np.asarray(jax.device_get(getattr(ref, name)))
        b = np.asarray(jax.device_get(getattr(sharded, name)))
        if name in INT_LEAVES:
            np.testing.assert_array_equal(a, b, err_msg=name)
        elif name in ("float_dens_1", "float_dens_2") and float_exact:
            # The STALE blur ping-pong buffer (pass steps-1) is allowed 1
            # ULP: XLA:CPU contracts the blur's mul+add differently inside
            # the shard_map-compiled program than in the single-device one
            # (diffs are exactly 1 ULP, uniform across shards and local
            # rows, and vanish when the identical slab+halo kernel calls
            # run OUTSIDE shard_map — so the halo plumbing is exact and
            # this is compile-context float contraction, not physics).
            # The FRESH buffer (what the renderer consumes) stays bitwise
            # in practice and anything beyond ~2 ULP still fails here.
            np.testing.assert_allclose(a, b, rtol=0, atol=1.5e-7,
                                       err_msg=name)
        elif float_exact:
            np.testing.assert_array_equal(a, b, err_msg=name)
        else:
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6,
                                       err_msg=name)


def test_spmd_matches_single_device_xla():
    cfg = base_cfg(pallas_mode="off")
    ref, sharded = run_both(cfg)
    assert_states_match(ref, sharded)


@pytest.mark.slow
def test_spmd_matches_single_device_pallas_interpret():
    """The real TPU kernel path, under sharding, via the interpreter."""
    cfg = base_cfg(pallas_mode="interpret")
    ref, sharded = run_both(cfg)
    assert_states_match(ref, sharded)


@pytest.mark.slow
def test_spmd_matches_single_device_grid_fused():
    """The fused sim-grid stage kernels (kernels/grid_fused.py) under
    sharding: single-device and SPMD run the same kernels -> bitwise."""
    cfg = base_cfg(pallas_mode="interpret", grid_fused=True,
                   solid_boxes=(((6, 8, 4), (10, 14, 8)),),
                   extra_forces=(((9, 12, 11), (50.0, -80.0, 0.0)),))
    ref, sharded = run_both(cfg)
    assert_states_match(ref, sharded)


@pytest.mark.slow
def test_spmd_interpret_matches_xla_formulations():
    """Pallas kernels == XLA stage formulations, both sharded."""
    _, sh_pallas = run_both(base_cfg(pallas_mode="interpret"), n_steps=2)
    _, sh_xla = run_both(base_cfg(pallas_mode="off"), n_steps=2)
    for name in sh_pallas._fields:
        a = np.asarray(jax.device_get(getattr(sh_pallas, name)))
        b = np.asarray(jax.device_get(getattr(sh_xla, name)))
        if name in INT_LEAVES:
            np.testing.assert_array_equal(a, b, err_msg=name)
        else:
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6,
                                       err_msg=name)


def test_spmd_with_obstacles_and_forces():
    """Global-coordinate features (solid boxes, fountain, extra forces)
    land in the right cells across shard boundaries."""
    cfg = base_cfg(pallas_mode="off",
                   solid_boxes=(((6, 8, 4), (10, 14, 8)),),
                   extra_forces=(((9, 12, 11), (50.0, -80.0, 0.0)),))
    ref, sharded = run_both(cfg)
    assert_states_match(ref, sharded)


@pytest.mark.slow
def test_spmd_multi_step_scan():
    cfg = base_cfg(pallas_mode="off")
    mesh = make_mesh(8)
    ref, _ = run_both(cfg, n_steps=4)
    sharded = shard_state(initial_state(cfg), mesh)
    sharded = spmd_multi_step(mesh, cfg, 4, donate=False)(sharded)
    assert_states_match(ref, sharded)


def test_spmd_sim_only_mode():
    cfg = base_cfg(pallas_mode="off", surface_enabled=False)
    ref, sharded = run_both(cfg, n_steps=2)
    assert_states_match(ref, sharded)


def test_validate_spmd_config_rejects_indivisible():
    with pytest.raises(ValueError):
        validate_spmd_config(base_cfg(grid_size=(18, 16, 16)), 8)
    with pytest.raises(ValueError):
        validate_spmd_config(base_cfg(particle_count=4097), 8)
