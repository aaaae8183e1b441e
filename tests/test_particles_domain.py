"""Domain-sharded particles (parallel/particles_domain.py, flag-gated via
FluidConfig.particle_sharding="domain"): particles live on the shard owning
their x-slab, sampling is slab-local, a ppermute exchange migrates
boundary-crossers.  Parity contract: grid fields are bitwise-identical to
the single-device step; the particle SET is preserved bitwise but slot
order is not (migration reshuffles slots)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.core.state import initial_state
from tpu_fluid.solver.step import simulation_step


def _cfg(**kw):
    d = dict(
        grid_size=(32, 16, 16),
        particle_count=4096,
        particle_init_cube_resolution=(16, 16, 16),
        particle_init_cube_offset=(5.0, 2.0, 2.0),
        particle_init_cube_size=(20.0, 9.0, 5.0),
        surface_render_resolution=2,
        jacobi_iters=40,
        advect_max_displacement=1,
        fountain_force=-2000.0,
        fountain_position=(16, 14, 8),
        particle_sharding="domain",
    )
    d.update(kw)
    return FluidConfig(**d)


def _sorted_active_positions(pos, act):
    p = np.asarray(jax.device_get(pos))[np.asarray(jax.device_get(act))]
    return p[np.lexsort((p[:, 2], p[:, 1], p[:, 0]))]


def _run_pair(cfg, steps=3):
    from tpu_fluid.parallel.mesh import make_mesh
    from tpu_fluid.parallel.particles_domain import domain_shard_state
    from tpu_fluid.parallel.spmd_step import spmd_step

    ref = initial_state(cfg)
    stepf = jax.jit(simulation_step, static_argnums=1)
    for _ in range(steps):
        ref = stepf(ref, cfg)

    mesh = make_mesh(8)
    sharded = domain_shard_state(initial_state(cfg), mesh, cfg)
    stepn = spmd_step(mesh, cfg, donate=False)
    for _ in range(steps):
        sharded = stepn(sharded)
    return ref, sharded


@pytest.mark.parametrize("mode", [
    "off", pytest.param("interpret", marks=pytest.mark.slow)])
def test_domain_matches_single_device(mode):
    cfg = _cfg(pallas_mode=mode)
    ref, sharded = _run_pair(cfg)
    for name in ("velocity", "cell_types", "inertia", "float_dens_1",
                 "float_dens_2", "detailed_occ"):
        a = np.asarray(jax.device_get(getattr(ref, name)))
        b = np.asarray(jax.device_get(getattr(sharded, name)))
        if name == "float_dens_2":
            # the STALE blur ping-pong buffer is allowed 1 ULP: XLA:CPU
            # contracts the blur's mul+add differently inside shard_map-
            # compiled programs (same phenomenon + justification as
            # test_spmd_step.assert_states_match; the FRESH buffer
            # float_dens_1 — what the renderer consumes — stays bitwise)
            np.testing.assert_allclose(a, b, rtol=0, atol=1.5e-7,
                                       err_msg=name)
        else:
            np.testing.assert_array_equal(a, b, err_msg=name)
    a = _sorted_active_positions(ref.positions, ref.active)
    b = _sorted_active_positions(sharded.positions, sharded.active)
    assert a.shape == b.shape            # no particles dropped
    np.testing.assert_array_equal(a, b)
    assert int(jax.device_get(sharded.dropped)) == 0   # counter agrees


def test_one_device_mesh_skips_collectives_and_matches():
    """make_mesh(1): halo_planes / jacobi edges / migrate take their
    no-neighbor shortcuts.  The compiled program must contain NO
    collective-permute at all — XLA:TPU's degenerate EMPTY-PAIR
    collective-permute measured 15-59 ms EACH on silicon (NOTES round-5,
    `docs/perf/trace_spmd_r5_128_pre_n1fix.jsonl`) — and the result must
    still match the single-device step exactly."""
    from tpu_fluid.parallel.mesh import make_mesh
    from tpu_fluid.parallel.particles_domain import domain_shard_state
    from tpu_fluid.parallel.spmd_step import spmd_step

    cfg = _cfg(pallas_mode="off")
    ref = initial_state(cfg)
    stepf = jax.jit(simulation_step, static_argnums=1)
    mesh = make_mesh(1)
    sharded = domain_shard_state(initial_state(cfg), mesh, cfg)
    stepn = spmd_step(mesh, cfg, donate=False)
    hlo = stepn.lower(sharded).compile().as_text()
    assert "collective-permute" not in hlo
    for _ in range(3):
        ref = stepf(ref, cfg)
        sharded = stepn(sharded)
    for name in ("velocity", "cell_types", "inertia", "float_dens_1",
                 "float_dens_2", "detailed_occ"):
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(getattr(ref, name))),
            np.asarray(jax.device_get(getattr(sharded, name))),
            err_msg=name)
    a = _sorted_active_positions(ref.positions, ref.active)
    b = _sorted_active_positions(sharded.positions, sharded.active)
    assert a.shape == b.shape
    np.testing.assert_array_equal(a, b)
    assert int(jax.device_get(sharded.dropped)) == 0


def test_domain_with_volume_projection_matches():
    """cell_histogram_local + the distributed volume drift under domain
    sharding."""
    cfg = _cfg(pallas_mode="off", volume_correction=0.03)
    ref, sharded = _run_pair(cfg)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(ref.velocity)),
        np.asarray(jax.device_get(sharded.velocity)))
    a = _sorted_active_positions(ref.positions, ref.active)
    b = _sorted_active_positions(sharded.positions, sharded.active)
    np.testing.assert_array_equal(a, b)


def test_domain_path_has_no_all_gather():
    """VERDICT r2 weak #5: the domain path's compiled HLO must not contain
    the full-field velocity all_gather (nor any other all-gather)."""
    from tpu_fluid.parallel.mesh import make_mesh
    from tpu_fluid.parallel.particles_domain import domain_shard_state
    from tpu_fluid.parallel.spmd_step import spmd_step

    cfg = _cfg(pallas_mode="off")
    mesh = make_mesh(8)
    sharded = domain_shard_state(initial_state(cfg), mesh, cfg)
    hlo = spmd_step(mesh, cfg, donate=False).lower(
        sharded).compile().as_text()
    assert not any(" all-gather(" in ln or " all-gather-start(" in ln
                   for ln in hlo.splitlines())


def test_migrate_exchanges_boundary_crossers():
    """Unit test of the fixed-capacity one-hop exchange on a 4-shard mesh:
    particles placed past their slab edge arrive at the neighbor, slot
    accounting stays consistent, non-crossers stay put."""
    from tpu_fluid.parallel.mesh import AXIS, make_mesh
    from tpu_fluid.parallel.particles_domain import migrate
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(4)
    lx, slots, m = 8, 128, 128
    # shard i owns x in [8i, 8i+8); give each shard: one stayer, one right-
    # crosser (x = 8i + 8.5, except the last shard), one left-crosser
    # (x = 8i - 0.5, except shard 0)
    pos = np.zeros((4 * slots, 3), np.float32)
    act = np.zeros((4 * slots,), bool)
    for i in range(4):
        base = i * slots
        pos[base] = (8 * i + 4.0, 1.0, 1.0)          # stays
        act[base] = True
        if i < 3:
            pos[base + 1] = (8 * i + 8.5, 2.0, float(i))   # -> shard i+1
            act[base + 1] = True
        if i > 0:
            pos[base + 2] = (8 * i - 0.5, 3.0, float(i))   # -> shard i-1
            act[base + 2] = True

    def local(p, a):
        x0 = jax.lax.axis_index(AXIS).astype(jnp.int32) * lx
        p, a, nd = migrate(p, a, x0, lx, m)
        return p, a, jax.lax.psum(nd, AXIS)

    fn = jax.jit(jax.shard_map(local, mesh=mesh,
                               in_specs=(P(AXIS), P(AXIS)),
                               out_specs=(P(AXIS), P(AXIS), P())))
    new_pos, new_act, ndrop = fn(jnp.asarray(pos), jnp.asarray(act))
    new_pos = np.asarray(jax.device_get(new_pos))
    new_act = np.asarray(jax.device_get(new_act))
    assert new_act.sum() == act.sum()                # nothing lost
    assert int(jax.device_get(ndrop)) == 0
    for i in range(4):
        seg_pos = new_pos[i * slots:(i + 1) * slots]
        seg_act = new_act[i * slots:(i + 1) * slots]
        xs = np.floor(seg_pos[seg_act][:, 0]).astype(int)
        assert ((xs >= 8 * i) & (xs < 8 * i + 8)).all()   # all owned now
    # every original particle survives somewhere, bitwise
    a = pos[act]
    b = new_pos[new_act]
    a = a[np.lexsort((a[:, 2], a[:, 1], a[:, 0]))]
    b = b[np.lexsort((b[:, 2], b[:, 1], b[:, 0]))]
    np.testing.assert_array_equal(a, b)


def test_domain_shard_state_packs_by_slab():
    from tpu_fluid.parallel.mesh import make_mesh
    from tpu_fluid.parallel.particles_domain import domain_shard_state

    cfg = _cfg()
    mesh = make_mesh(8)
    st = domain_shard_state(initial_state(cfg), mesh, cfg)
    pos = np.asarray(jax.device_get(st.positions))
    act = np.asarray(jax.device_get(st.active))
    assert pos.shape[0] % 8 == 0
    slots = pos.shape[0] // 8
    assert act.sum() == 4096                         # all packed, none lost
    lx = 32 // 8
    for i in range(8):
        seg = pos[i * slots:(i + 1) * slots][act[i * slots:(i + 1) * slots]]
        if len(seg):
            xs = np.floor(seg[:, 0]).astype(int)
            assert ((xs >= i * lx) & (xs < (i + 1) * lx)).all()


def test_domain_shard_state_census_sizing_uneven_scene():
    """VERDICT r3 weak #2: slots must be sized from the ACTUAL initial slab
    census, not the global mean.  This scene packs every particle into ONE
    of 8 slabs — the old particle_count/n * slack formula (1024 slots here)
    would silently drop 3072 of 4096 particles at init."""
    from tpu_fluid.parallel.mesh import make_mesh
    from tpu_fluid.parallel.particles_domain import (domain_shard_state,
                                                     domain_slots)

    cfg = _cfg(particle_init_cube_offset=(4.1, 2.0, 2.0),
               particle_init_cube_size=(3.8, 9.0, 5.0))   # x in slab 1 only
    mesh = make_mesh(8)
    st = domain_shard_state(initial_state(cfg), mesh, cfg)
    act = np.asarray(jax.device_get(st.active))
    assert act.sum() == 4096                         # zero drops
    # the census-aware sizing grew the slots well past the mean-based floor
    assert st.positions.shape[0] // 8 >= 4096
    assert domain_slots(cfg, 8) < 4096               # the old floor


def test_domain_shard_state_flagship_scene_zero_drops():
    """The flagship scaled_scene(128) sits exactly at the old formula's
    capacity cliff (the cube spans half the x extent: 250k particles/slab
    against 250k mean-sized slots).  Census sizing must shard it drop-free
    on the 8-way mesh."""
    from tpu_fluid.parallel.mesh import make_mesh
    from tpu_fluid.parallel.particles_domain import domain_shard_state

    cfg = FluidConfig.scaled_scene(128, particle_count=1_000_000,
                                   jacobi_iters=1)
    cfg = cfg.replace(particle_sharding="domain")
    mesh = make_mesh(8)
    st = domain_shard_state(initial_state(cfg), mesh, cfg)
    act = np.asarray(jax.device_get(st.active))
    assert act.sum() == 1_000_000                    # zero drops


def _migrate_once(mesh, pos, act, lx, m):
    from jax.sharding import PartitionSpec as P

    from tpu_fluid.parallel.mesh import AXIS
    from tpu_fluid.parallel.particles_domain import migrate

    def local(p, a):
        x0 = jax.lax.axis_index(AXIS).astype(jnp.int32) * lx
        p, a, nd = migrate(p, a, x0, lx, m)
        return p, a, jax.lax.psum(nd, AXIS)

    fn = jax.jit(jax.shard_map(local, mesh=mesh,
                               in_specs=(P(AXIS), P(AXIS)),
                               out_specs=(P(AXIS), P(AXIS), P())),
                 static_argnums=())
    new_pos, new_act, nd = fn(jnp.asarray(pos), jnp.asarray(act))
    return (np.asarray(jax.device_get(new_pos)),
            np.asarray(jax.device_get(new_act)),
            int(jax.device_get(nd)))


def test_migrate_buffer_overflow_counts_drops():
    """Bounded-loss contract, send side: crossers beyond the m-per-direction
    buffer are deactivated AND counted in the returned drop balance."""
    from tpu_fluid.parallel.mesh import make_mesh

    mesh = make_mesh(4)
    lx, slots, m = 8, 128, 4
    pos = np.zeros((4 * slots, 3), np.float32)
    act = np.zeros((4 * slots,), bool)
    for j in range(m + 2):                     # 6 right-crossers, buffer 4
        pos[j] = (8.5, 1.0, float(j))
        act[j] = True
    new_pos, new_act, nd = _migrate_once(mesh, pos, act, lx, m)
    assert nd == 2                             # 2 beyond the buffer
    assert new_act.sum() == act.sum() - 2
    # the m that fit arrived on shard 1
    seg = new_pos[slots:2 * slots][new_act[slots:2 * slots]]
    assert len(seg) == m
    assert (np.floor(seg[:, 0]) == 8).all()


def test_migrate_slot_exhaustion_counts_drops():
    """Bounded-loss contract, receive side: arrivals beyond the destination
    shard's free slots are dropped and counted."""
    from tpu_fluid.parallel.mesh import make_mesh

    mesh = make_mesh(4)
    lx, slots, m = 8, 8, 4
    pos = np.zeros((4 * slots, 3), np.float32)
    act = np.zeros((4 * slots,), bool)
    pos[0] = (8.5, 1.0, 0.0)                   # shard 0: 2 right-crossers
    pos[1] = (8.5, 1.0, 1.0)
    act[0] = act[1] = True
    # shard 1: every slot active, none leaving -> zero free slots
    for j in range(slots):
        pos[slots + j] = (12.0, 1.0, float(j))
        act[slots + j] = True
    new_pos, new_act, nd = _migrate_once(mesh, pos, act, lx, m)
    assert nd == 2                             # both arrivals had no slot
    assert new_act.sum() == act.sum() - 2
    assert new_act[slots:2 * slots].all()      # shard 1 undisturbed


def test_migrate_multi_slab_crosser_one_hop_per_step():
    """A CFL-violating particle 2 slabs away migrates one hop per exchange
    and arrives (undropped) after two exchanges — the documented contract
    (particles_domain.py module docstring)."""
    from tpu_fluid.parallel.mesh import make_mesh

    mesh = make_mesh(4)
    lx, slots, m = 8, 128, 8
    pos = np.zeros((4 * slots, 3), np.float32)
    act = np.zeros((4 * slots,), bool)
    pos[0] = (20.5, 1.0, 7.0)                  # owned by shard 2, lives on 0
    act[0] = True
    pos1, act1, nd1 = _migrate_once(mesh, pos, act, lx, m)
    assert nd1 == 0 and act1.sum() == 1
    assert act1[slots:2 * slots].sum() == 1    # hop 1: shard 1
    pos2, act2, nd2 = _migrate_once(mesh, pos1, act1, lx, m)
    assert nd2 == 0 and act2.sum() == 1
    assert act2[2 * slots:3 * slots].sum() == 1   # hop 2: home
    seg = pos2[2 * slots:3 * slots][act2[2 * slots:3 * slots]]
    np.testing.assert_array_equal(seg[0], np.array([20.5, 1.0, 7.0],
                                                   np.float32))
