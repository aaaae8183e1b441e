"""Dynamic scene fields (core/scene_fields.py): per-cell solid mask and
force field supplied as device arrays — the reference's first stated
future-work item (`README.md:156`, "boolean [solid] texture ... force
vector texture"), implemented across the single-device and SPMD steps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.core.scene_fields import (SceneFields, solid_sphere,
                                         uniform_force)
from tpu_fluid.core.state import initial_state
from tpu_fluid.core.types import CellType
from tpu_fluid.solver.step import jit_multi_step, simulation_step


def _cfg(**kw):
    d = dict(
        grid_size=(24, 24, 24),
        particle_count=8192,
        particle_init_cube_resolution=(32, 16, 16),
        particle_init_cube_offset=(4.0, 2.0, 4.0),
        particle_init_cube_size=(16.0, 8.0, 16.0),
        surface_render_resolution=2,
        jacobi_iters=30,
        advect_max_displacement=1,
    )
    d.update(kw)
    return FluidConfig(**d)


def test_validate_rejects_bad_shapes():
    cfg = _cfg()
    with pytest.raises(ValueError):
        SceneFields(solid=jnp.zeros((8, 8, 8), jnp.uint8)).validate(cfg)
    with pytest.raises(ValueError):
        SceneFields(force=jnp.zeros((3, 8, 8, 8))).validate(cfg)
    SceneFields(solid=jnp.zeros(cfg.grid_size, jnp.uint8),
                force=jnp.zeros((3,) + cfg.grid_size)).validate(cfg)


def test_dynamic_solid_cells_become_solid_and_block_particles():
    cfg = _cfg()
    # sphere strictly below the initial water slab (+y is down): falling
    # fluid meets it, and no particle starts inside it
    scene = SceneFields(solid=solid_sphere(cfg, (12, 16, 12), 3))
    state = initial_state(cfg)
    for _ in range(8):
        state = simulation_step(state, cfg, scene)
    t = np.asarray(state.cell_types)
    sph = np.asarray(scene.solid) != 0
    # every dynamic-solid cell is SOLID
    assert (t[sph] == CellType.SOLID).all()
    # no particle sits inside the sphere (repel + typing keep them out)
    pos = np.asarray(state.positions)
    act = np.asarray(state.active) > 0
    cells = np.floor(pos[act]).astype(int)
    inb = ((cells >= 0) & (cells < 24)).all(axis=1)
    cells = cells[inb]
    assert not sph[cells[:, 0], cells[:, 1], cells[:, 2]].any()


def test_force_field_accelerates_fluid():
    cfg = _cfg(gravity=0.0)   # isolate the scene force
    wind = uniform_force(cfg, (120.0, 0.0, 0.0))
    state0 = initial_state(cfg)
    plain = state0
    pushed = state0
    for _ in range(6):
        plain = simulation_step(plain, cfg)
        pushed = simulation_step(pushed, cfg, SceneFields(force=wind))
    # mean x drift of the pushed particles exceeds the unforced run
    act = np.asarray(state0.active) > 0
    dx_plain = (np.asarray(plain.positions)[act, 0]
                - np.asarray(state0.positions)[act, 0]).mean()
    dx_push = (np.asarray(pushed.positions)[act, 0]
               - np.asarray(state0.positions)[act, 0]).mean()
    assert dx_push > dx_plain + 0.05


def test_jit_multi_step_accepts_scene():
    cfg = _cfg()
    scene = SceneFields(solid=solid_sphere(cfg, (12, 12, 12), 3),
                        force=uniform_force(cfg, (0.0, 0.0, 40.0)))
    state = initial_state(cfg)
    s2 = state
    for _ in range(3):
        s2 = simulation_step(s2, cfg, scene)
    s1 = jit_multi_step(state, cfg, 3, scene)   # donates `state`
    np.testing.assert_array_equal(np.asarray(s1.cell_types),
                                  np.asarray(s2.cell_types))


def test_spmd_scene_matches_single_device():
    """Scene fields under the explicit SPMD step == single-device, with
    integer leaves bitwise (XLA formulations both sides)."""
    from tpu_fluid.parallel.mesh import make_mesh, shard_state
    from tpu_fluid.parallel.spmd_step import scene_pspecs, spmd_step

    cfg = _cfg(grid_size=(32, 16, 16), pallas_mode="off",
               particle_init_cube_resolution=(16, 16, 16),
               particle_init_cube_offset=(5.0, 2.0, 2.0),
               particle_init_cube_size=(20.0, 9.0, 5.0))
    scene = SceneFields(solid=solid_sphere(cfg, (16, 8, 8), 3),
                        force=uniform_force(cfg, (60.0, 0.0, 0.0)))

    ref = initial_state(cfg)
    stepf = jax.jit(simulation_step, static_argnums=1)
    for _ in range(3):
        ref = stepf(ref, cfg, scene)

    mesh = make_mesh(8)
    sharded = shard_state(initial_state(cfg), mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P
    sc = SceneFields(
        solid=jax.device_put(scene.solid, NamedSharding(mesh, P("x"))),
        force=jax.device_put(scene.force, NamedSharding(mesh,
                                                        P(None, "x"))))
    stepn = spmd_step(mesh, cfg, donate=False, scene=scene)
    for _ in range(3):
        sharded = stepn(sharded, sc)

    for name in ref._fields:
        a = np.asarray(jax.device_get(getattr(ref, name)))
        b = np.asarray(jax.device_get(getattr(sharded, name)))
        if a.dtype.kind in "iub":
            np.testing.assert_array_equal(a, b, err_msg=name)
        else:
            np.testing.assert_array_equal(a, b, err_msg=name)
