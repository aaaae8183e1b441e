"""Equivalence tests: the TPU-fast code paths (packed-row particle sampler,
gather-free shift-select advection) must match the reference-shaped gather
paths, which the golden tests pin to the oracle."""

import numpy as np
import jax.numpy as jnp

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.ops.packed_sampler import (build_packed_table,
                                          sample_velocity_packed)
from tpu_fluid.ops.sampling import velocity_at
from tpu_fluid.stages import velocity as vstages
import oracle

N = 10
CFG = FluidConfig(grid_size=(N, N, N), jacobi_iters=10)


def random_types(r):
    dens = (r.random((N, N, N)) < 0.3).astype(np.int64)
    return oracle.update_air(oracle.update_water(dens))


def test_packed_sampler_matches_gather_inside():
    r = np.random.default_rng(0)
    vel = jnp.asarray(r.standard_normal((3, N, N, N)).astype(np.float32))
    pos = jnp.asarray((r.random((5000, 3)) * N).astype(np.float32))
    table = build_packed_table(vel)
    fast = sample_velocity_packed(table, (N, N, N), pos)
    ref = velocity_at(vel, pos)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_packed_sampler_matches_gather_outside():
    """Out-of-box positions must reproduce clamp-to-edge sampling."""
    r = np.random.default_rng(1)
    vel = jnp.asarray(r.standard_normal((3, N, N, N)).astype(np.float32))
    pos = jnp.asarray((r.random((2000, 3)) * (N + 6) - 3).astype(np.float32))
    table = build_packed_table(vel)
    fast = sample_velocity_packed(table, (N, N, N), pos)
    ref = velocity_at(vel, pos)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_packed_sampler_noncubic():
    r = np.random.default_rng(2)
    shape = (6, 9, 12)
    vel = jnp.asarray(r.standard_normal((3,) + shape).astype(np.float32))
    pos = jnp.asarray((r.random((3000, 3)) * np.array(shape)).astype(
        np.float32))
    table = build_packed_table(vel)
    fast = sample_velocity_packed(table, shape, pos)
    ref = velocity_at(vel, pos)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_face_center_velocity_matches_sampling():
    r = np.random.default_rng(3)
    vel = jnp.asarray(r.standard_normal((3, N, N, N)).astype(np.float32))
    base = np.stack(np.meshgrid(*[np.arange(N)] * 3, indexing="ij"),
                    axis=-1).astype(np.float32)
    for c in range(3):
        fmove = np.array([0.5 if k != c else 0.0 for k in range(3)],
                         dtype=np.float32)
        pos = jnp.asarray((base + fmove).reshape(-1, 3))
        ref = np.asarray(velocity_at(vel, pos)).reshape(N, N, N, 3)
        fast = np.asarray(vstages.face_center_velocity(vel, c))
        for cp in range(3):
            np.testing.assert_allclose(fast[cp], ref[..., cp],
                                       rtol=1e-5, atol=1e-6,
                                       err_msg=f"face {c} comp {cp}")


def test_shift_advect_matches_gather_advect():
    r = np.random.default_rng(4)
    types = jnp.asarray(random_types(r))
    vel = jnp.asarray((r.standard_normal((3, N, N, N)) * 3).astype(
        np.float32))
    fast = vstages.advect(types, vel, CFG)
    ref = vstages.advect_gather(types, vel, CFG)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_shift_advect_large_velocity_clamped():
    """|v|*dt beyond R cells: the fast path clamps the displacement; verify
    it still produces finite, in-range values and matches the gather path
    when the gather path's displacement is also within R."""
    r = np.random.default_rng(5)
    types = jnp.asarray(random_types(r))
    vel = jnp.asarray((r.standard_normal((3, N, N, N)) * 150).astype(
        np.float32))  # |v|*dt up to ~6 cells > R=2
    fast = np.asarray(vstages.advect(types, vel, CFG))
    assert np.isfinite(fast).all()
    assert np.abs(fast).max() <= np.abs(np.asarray(vel)).max() + 1e-3


def test_jacobi_whole_grid_matches_slab_interpret():
    """The VMEM-resident whole-grid Jacobi kernel and the K-slab kernel must
    agree bitwise (same sweep arithmetic, different HBM pass structure)."""
    from tpu_fluid.kernels.jacobi import jacobi_sweeps_pallas
    r = np.random.default_rng(6)
    n = 12
    water = jnp.asarray(r.random((n, n, n)) < 0.4)
    rd = jnp.where(water, jnp.float32(0.25), 0.0)
    c2 = jnp.asarray(r.standard_normal((n, n, n)).astype(np.float32))
    q0 = jnp.where(water, jnp.float32(1.0), 0.0)
    whole = jacobi_sweeps_pallas(q0, rd, c2, 17, interpret=True,
                                 whole_grid=True)
    slab = jacobi_sweeps_pallas(q0, rd, c2, 17, interpret=True,
                                whole_grid=False)
    np.testing.assert_array_equal(np.asarray(whole), np.asarray(slab))


def test_paired_table_matches_64lane():
    """The z-halves-paired 128-lane table + row indices must reproduce the
    64-lane table row-for-row, and the paired sample kernel must move
    particles bitwise-identically."""
    from tpu_fluid.kernels.pack_table import (build_packed_table_pallas,
                                              build_packed_table_pallas2)
    from tpu_fluid.kernels.particle_sample import sample_and_move
    from tpu_fluid.ops.packed_sampler import (packed_row_indices,
                                              packed_row_indices2)
    r = np.random.default_rng(11)
    vel = jnp.asarray(r.standard_normal((3, N, N, N)).astype(np.float32))
    t64 = build_packed_table_pallas(vel, interpret=True)
    t128 = build_packed_table_pallas2(vel, interpret=True)
    hz = N // 2
    pos = jnp.asarray((r.random((2048, 3)) * (N + 2) - 1).astype(np.float32))
    act = jnp.asarray(r.random(2048) < 0.9)
    i64 = packed_row_indices(pos, (N, N, N))
    i128 = packed_row_indices2(pos, (N, N, N))
    r64 = jnp.take(t64, i64, axis=0, mode="clip")
    r128 = jnp.take(t128, i128, axis=0, mode="clip")
    # the row halves are the 64-lane rows of the two paired cells
    j = np.clip(np.floor(np.asarray(pos)).astype(np.int64), 0, N - 1)
    hi = j[:, 2] >= hz
    half = np.where(hi[:, None], np.asarray(r128)[:, 64:],
                    np.asarray(r128)[:, :64])
    np.testing.assert_array_equal(half, np.asarray(r64))
    a = sample_and_move(r64, pos.T, act, (N, N, N), 0.25, interpret=True)
    b = sample_and_move(r128, pos.T, act, (N, N, N), 0.25, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_packed_pair_z_flag_parity():
    """cfg.packed_pair_z=False must route move_particles through the
    64-lane table and land particles bitwise where the paired path does
    (the A/B knob behind TPU_FLUID_BENCH_SET=packed_pair_z=false)."""
    from tpu_fluid.core.config import FluidConfig
    from tpu_fluid.stages.particles import move_particles
    r = np.random.default_rng(13)
    gs = (4, 8, 128)          # gz >= 128: the paired gate is live
    vel = jnp.asarray(r.standard_normal((3,) + gs).astype(np.float32))
    pos = jnp.asarray(
        (r.random((512, 3)) * np.array(gs)).astype(np.float32))
    act = jnp.asarray(r.random(512) < 0.9)
    cfg = FluidConfig(grid_size=gs, particle_count=512,
                      pallas_mode="interpret")
    a = move_particles(vel, pos, act, cfg)
    b = move_particles(vel, pos, act, cfg.replace(packed_pair_z=False))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_advect_one_matches_all_and_shift():
    """advect_one_pallas (per-component, direct vel halos + in-register
    face-center velocity — the big-plane path) must match advect_all_pallas
    and the XLA shift oracle."""
    from tpu_fluid.kernels.advect import advect_all_pallas, advect_one_pallas
    rng = np.random.default_rng(3)
    types = jnp.asarray(random_types(rng).astype(np.uint8))
    vel = jnp.asarray(
        3.0 * rng.standard_normal((3, N, N, N)).astype(np.float32))
    r = CFG.advect_max_displacement
    cond3 = jnp.stack([vstages._advect_condition(types, c)
                       for c in range(3)]).astype(jnp.uint8)
    all_k = advect_all_pallas(vel, cond3, r, CFG.dt, interpret=True)
    ref = vstages.advect_shift(types, vel, CFG)
    for c in range(3):
        one = advect_one_pallas(vel, cond3[c], c, r, CFG.dt,
                                interpret=True)
        np.testing.assert_array_equal(np.asarray(one), np.asarray(all_k[c]))
        np.testing.assert_allclose(np.asarray(one), np.asarray(ref[c]),
                                   rtol=1e-5, atol=1e-5)


def test_jacobi_direct_halo_blocks_match():
    """The direct-halo slab path (k | tx: halo blocks read straight from
    the field with clamped index maps + edge masking) must match the
    materialized-halo path (k does not divide tx) and the whole-grid kernel
    bitwise."""
    from tpu_fluid.kernels.jacobi import jacobi_sweeps_pallas
    r = np.random.default_rng(7)
    n = 16
    water = jnp.asarray(r.random((n, n, n)) < 0.4)
    rd = jnp.where(water, jnp.float32(0.25), 0.0)
    c2 = jnp.asarray(r.standard_normal((n, n, n)).astype(np.float32))
    q0 = jnp.where(water, jnp.float32(1.0), 0.0)
    whole = jacobi_sweeps_pallas(q0, rd, c2, 9, interpret=True,
                                 whole_grid=True)
    direct = jacobi_sweeps_pallas(q0, rd, c2, 9, k=4, tx=16, interpret=True,
                                  whole_grid=False)     # 4 | 16 -> direct
    mat = jacobi_sweeps_pallas(q0, rd, c2, 9, k=3, tx=16, interpret=True,
                               whole_grid=False)        # 3 does not divide
    np.testing.assert_array_equal(np.asarray(whole), np.asarray(direct))
    np.testing.assert_array_equal(np.asarray(whole), np.asarray(mat))


def test_slab_sizes_defaults_and_explicit():
    """k/tx None resolve to the measured-best default per rd dtype ((8, 16)
    f32, (4, 32) u8); explicit values are honored (subject only to the VMEM
    budget), including an explicit (8, 16) with u8 rd."""
    from tpu_fluid.kernels.jacobi import _slab_sizes
    # small plane: the budget never binds, raw defaults come through
    assert _slab_sizes(256, 128, 128, None, None, 4) == (8, 16)
    # 256^3 planes: the f32 default shrinks to the documented (4, 16);
    # the u8 default (4, 32) fits its enlarged budget as-is
    assert _slab_sizes(256, 256, 256, None, None, 4) == (4, 16)
    assert _slab_sizes(256, 256, 256, None, None, 1) == (4, 32)
    assert _slab_sizes(256, 256, 256, 8, 16, 1) == (8, 16)
    assert _slab_sizes(256, 256, 256, 4, 16, 4) == (4, 16)
    # tiny grids clamp tx to a divisor of gx regardless of dtype
    k, tx = _slab_sizes(12, 12, 12, None, None, 4)
    assert 12 % tx == 0 and k <= tx


def test_clamped_halo_maps_arithmetic():
    """lo/hi address the halo blocks just outside tile b, clamped in-range:
    interior tiles get true neighbors; domain-end tiles re-read an
    in-domain block (the kernels mask those).  r0=1 degenerates to the
    replicate-edge maps pack_table uses."""
    from tpu_fluid.kernels.halo import clamped_halo_maps
    lo, hi = clamped_halo_maps(4, 11)      # tx//h = 4, 3 tiles of 4 units
    assert [int(lo(b)) for b in range(3)] == [0, 3, 7]
    assert [int(hi(b)) for b in range(3)] == [4, 8, 11]
    lo1, hi1 = clamped_halo_maps(1, 9)     # single-row units (pack_table)
    assert [int(lo1(i)) for i in (0, 1, 9)] == [0, 0, 8]
    assert [int(hi1(i)) for i in (0, 8, 9)] == [1, 9, 9]
