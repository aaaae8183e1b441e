"""TPU-only Pallas kernel regression tests.

The main suite runs on a virtual CPU mesh where the Pallas TPU kernels can't
compile; these tests pin every kernel to its XLA-path twin on real hardware.
Run with:  TPU_FLUID_TPU_TESTS=1 python -m pytest tests/tpu -q  (on a TPU host;
they self-skip elsewhere).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="requires TPU hardware")

from tpu_fluid.core.config import FluidConfig            # noqa: E402
from tpu_fluid.core.types import CellType                # noqa: E402


def _types(n, key):
    t = jnp.where(jax.random.uniform(key, (n, n, n)) < 0.3,
                  jnp.uint8(CellType.WATER), jnp.uint8(CellType.INACTIVE))
    ix = jnp.arange(n)
    border = ((ix[:, None, None] % (n - 1) == 0)
              | (ix[None, :, None] % (n - 1) == 0)
              | (ix[None, None, :] % (n - 1) == 0))
    return jnp.where(border, jnp.uint8(CellType.SOLID), t)


def test_pallas_advect_matches_shift():
    from tpu_fluid.stages import velocity as vstages
    n = 16
    cfg = FluidConfig(grid_size=(n, n, n))
    key = jax.random.PRNGKey(0)
    types = _types(n, key)
    vel = 3.0 * jax.random.normal(key, (3, n, n, n), dtype=jnp.float32)
    fast = jax.jit(lambda t, v: vstages.advect_pallas(t, v, cfg))(types, vel)
    ref = jax.jit(lambda t, v: vstages.advect_shift(t, v, cfg))(types, vel)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("whole_grid", [True, False])
def test_pallas_jacobi_matches_xla_loop(whole_grid):
    from tpu_fluid.kernels.jacobi import jacobi_sweeps_pallas
    from tpu_fluid.ops.stencil import MOVES, shifted
    n = 16
    key = jax.random.PRNGKey(1)
    water = jax.random.uniform(key, (n, n, n)) < 0.4
    rd = jnp.where(water, 0.2, 0.0)
    c2 = jax.random.normal(key, (n, n, n), dtype=jnp.float32)
    p0 = jnp.ones((n, n, n), jnp.float32)
    # kernel contract: the loop state is the water-MASKED pressure q
    got = jax.jit(lambda p: jacobi_sweeps_pallas(
        jnp.where(water, p, 0.0), rd, c2, 21, whole_grid=whole_grid))(p0)
    got = jnp.where(water, got, p0)

    @jax.jit
    def ref(p):
        def sweep(_, p):
            pw = jnp.where(water, p, 0.0)
            neigh = sum(shifted(pw, mv) for mv in MOVES)
            return jnp.where(rd > 0, neigh * rd + c2, p)
        return jax.lax.fori_loop(0, 21, sweep, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref(p0)),
                               rtol=1e-4, atol=1e-5)


def test_pallas_move_matches_reference_sampler():
    from tpu_fluid.stages.particles import move_particles
    from tpu_fluid.ops.sampling import velocity_at
    n, p = 12, 4096
    cfg = FluidConfig(grid_size=(n, n, n))
    key = jax.random.PRNGKey(2)
    vel = jax.random.normal(key, (3, n, n, n), dtype=jnp.float32)
    pos = jax.random.uniform(jax.random.PRNGKey(3), (p, 3),
                             minval=0.0, maxval=float(n))
    act = jax.random.uniform(jax.random.PRNGKey(4), (p,)) < 0.8
    fast = jax.jit(lambda v, q, a: move_particles(v, q, a, cfg))(vel, pos,
                                                                 act)
    ref = jnp.where(act[:, None], pos + velocity_at(vel, pos) * cfg.dt, pos)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_pallas_table_bitwise_matches_xla():
    from tpu_fluid.kernels.pack_table import build_packed_table_pallas
    from tpu_fluid.ops.packed_sampler import build_packed_table
    key = jax.random.PRNGKey(5)
    vel = jax.random.normal(key, (3, 12, 12, 12), dtype=jnp.float32)
    a = np.asarray(jax.jit(build_packed_table)(vel))
    b = np.asarray(jax.jit(build_packed_table_pallas)(vel))
    np.testing.assert_array_equal(a, b)


def test_pallas_advect_large_plane_fallback():
    """gy*gz > 128^2 routes to the per-component kernel; same semantics."""
    from tpu_fluid.stages import velocity as vstages
    nx, ny, nz = 8, 144, 144
    cfg = FluidConfig(grid_size=(nx, ny, nz))
    key = jax.random.PRNGKey(7)
    t = jnp.where(jax.random.uniform(key, (nx, ny, nz)) < 0.3,
                  jnp.uint8(CellType.WATER), jnp.uint8(CellType.INACTIVE))
    vel = 3.0 * jax.random.normal(key, (3, nx, ny, nz), dtype=jnp.float32)
    fast = jax.jit(lambda tt, v: vstages.advect_pallas(tt, v, cfg))(t, vel)
    ref = jax.jit(lambda tt, v: vstages.advect_shift(tt, v, cfg))(t, vel)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_surface_fused_matches_stages():
    """Fused stages 16-18 kernel (Mosaic codegen) vs the jnp stage
    composition; ints bitwise, floats bitwise too (same per-cell ops)."""
    from tpu_fluid.stages import surface_fields
    from tpu_fluid.kernels.surface_fused import surface_fused_pallas
    n = 16
    cfg = FluidConfig(grid_size=(n, n, n), surface_render_resolution=2,
                      solid_boxes=(((4, 4, 4), (8, 8, 8)),))
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    d = cfg.detailed_size
    occ = (jax.random.uniform(k1, d) < 0.3).astype(jnp.uint8)
    inertia = jax.random.randint(k2, d, 0, cfg.max_inertia + 1,
                                 dtype=jnp.int32)
    f2 = jax.random.normal(k3, d, dtype=jnp.float32)
    types = _types(n, jax.random.PRNGKey(4))

    skip = surface_fields.solid_parent_mask(types, cfg)
    fused = jax.jit(lambda o, i, f: surface_fused_pallas(
        o, i, f, skip.astype(jnp.uint8),
        steps=cfg.float_density_diffuse_steps,
        k=cfg.float_density_diffuse_coefficient,
        inc_filled=cfg.inertia_increase_filled,
        inc_neigh=cfg.inertia_increase_neighbour,
        required_hits=cfg.inertia_required_neighbour_hits,
        dec=cfg.inertia_decrease, max_inertia=cfg.max_inertia,
        div_coef=cfg.float_density_division_coefficient))(occ, inertia, f2)

    ref_inertia = surface_fields.update_inertia(occ, inertia, cfg)
    ref_f1 = surface_fields.float_densities(ref_inertia, cfg)
    ref_f1, ref_f2 = surface_fields.blur_float_densities(
        types, ref_f1, f2, cfg)

    np.testing.assert_array_equal(np.asarray(fused[0]),
                                  np.asarray(ref_inertia))
    np.testing.assert_allclose(np.asarray(fused[1]), np.asarray(ref_f1),
                               rtol=2e-7, atol=2e-7)
    np.testing.assert_allclose(np.asarray(fused[2]), np.asarray(ref_f2),
                               rtol=2e-7, atol=2e-7)


def test_pallas_grid_fused_matches_stages():
    """Fused sim-grid stage-group kernels (Mosaic codegen) vs the jnp
    stages: types bitwise, floats to FMA-contraction tolerance."""
    from tpu_fluid.kernels.grid_fused import (classify_extrap_pallas,
                                              forces_solids_div_pallas,
                                              project_pallas)
    from tpu_fluid.stages import celltypes, pressure
    from tpu_fluid.stages import velocity as vstages
    n = 16
    cfg = FluidConfig(grid_size=(n, n, n),
                      solid_boxes=(((4, 4, 4), (8, 8, 8)),))
    key = jax.random.PRNGKey(7)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    occ = (jax.random.uniform(k1, (n, n, n)) < 0.35).astype(jnp.uint8)
    old_types = jax.random.randint(k2, (n, n, n), 0, 4,
                                   dtype=jnp.int32).astype(jnp.uint8)
    vel = 3.0 * jax.random.normal(k3, (3, n, n, n), dtype=jnp.float32)
    p = jax.random.normal(k4, (n, n, n), dtype=jnp.float32)

    new_types = celltypes.update_air(
        celltypes.update_water((occ > 0).astype(jnp.int32)), cfg)
    extr = vstages.compute_extrapolated_velocities(old_types, vel)
    ref_v5 = vstages.set_extrapolated_velocities(old_types, new_types, vel,
                                                 extr)
    t, v5 = jax.jit(lambda o, ot, v: classify_extrap_pallas(
        o, ot, v, cfg))(occ, old_types, vel)
    np.testing.assert_array_equal(np.asarray(t), np.asarray(new_types))
    np.testing.assert_allclose(np.asarray(v5), np.asarray(ref_v5),
                               rtol=1e-6, atol=1e-7)

    types = new_types
    ref_v = vstages.apply_solids(types, vstages.apply_forces(types, vel,
                                                             cfg), cfg)
    ref_div = pressure.compute_divergence(ref_v)
    v, div = jax.jit(lambda t_, v_: forces_solids_div_pallas(
        t_, v_, cfg))(types, vel)
    np.testing.assert_allclose(np.asarray(v), np.asarray(ref_v),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(div), np.asarray(ref_div),
                               rtol=1e-6, atol=2e-7)

    ref_pv = pressure.pressure_project(types, p, vel, cfg)
    pv = jax.jit(lambda t_, p_, v_: project_pallas(t_, p_, v_, cfg))(
        types, p, vel)
    np.testing.assert_allclose(np.asarray(pv), np.asarray(ref_pv),
                               rtol=1e-6, atol=1e-7)


def test_paired_table_matches_64lane_on_tpu():
    """z-halves-paired 128-lane table on real silicon (the Mosaic lane
    concat only compiles for wide halves, hence the thin gz=128 grid):
    rows and the fused sample kernel must match the 64-lane path bitwise."""
    from tpu_fluid.kernels.pack_table import (build_packed_table_pallas,
                                              build_packed_table_pallas2)
    from tpu_fluid.kernels.particle_sample import sample_and_move
    from tpu_fluid.ops.packed_sampler import (packed_row_indices,
                                              packed_row_indices2)
    gs = (8, 16, 128)
    key = jax.random.PRNGKey(5)
    vel = jax.random.normal(key, (3,) + gs, dtype=jnp.float32)
    pos = jax.random.uniform(key, (4096, 3), minval=-1.0,
                             maxval=float(max(gs)) + 1.0)
    act = jax.random.uniform(key, (4096,)) < 0.9
    t64 = jax.jit(build_packed_table_pallas)(vel)
    t128 = jax.jit(build_packed_table_pallas2)(vel)
    r64 = jnp.take(t64, packed_row_indices(pos, gs), axis=0, mode="clip")
    r128 = jnp.take(t128, packed_row_indices2(pos, gs), axis=0, mode="clip")
    a = jax.jit(lambda r, p, m: sample_and_move(r, p, m, gs, 0.25))(
        r64, pos.T, act)
    b = jax.jit(lambda r, p, m: sample_and_move(r, p, m, gs, 0.25))(
        r128, pos.T, act)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_occupancy_duplicate_scatter_on_tpu():
    """ADVICE r3: unique_indices=True on duplicate indices is only safe
    while every duplicate writes the same constant — pin the real TPU
    scatter emitter's behavior under heavy duplication (5000 particles in
    one cell must read exactly 1; untouched cells 0)."""
    from tpu_fluid.stages import particles
    cfg = FluidConfig(grid_size=(16, 16, 16), particle_count=5200,
                      surface_render_resolution=2)
    key = jax.random.PRNGKey(9)
    heavy = jnp.full((5000, 3), 3.25, jnp.float32)
    spread = jax.random.uniform(key, (200, 3), minval=0.0, maxval=16.0)
    pos = jnp.concatenate([heavy, spread])
    act = jnp.ones((5200,), bool)
    occ = np.asarray(jax.jit(
        lambda p, a: particles.detailed_occupancy(p, a, cfg))(pos, act))
    # exact-count histogram (at[].add) is the independent reference
    want = np.asarray(jax.jit(
        lambda p, a: particles.detailed_densities(p, a, cfg))(pos, act))
    np.testing.assert_array_equal(occ.astype(bool), want > 0)
    assert occ[6, 6, 6] == 1 and set(np.unique(occ)) <= {0, 1}


def test_pallas_jacobi_u8_code_bitwise_matches_f32():
    """The u8 aii-code path (production: stages/pressure.poisson_solve
    encodes rd = where(update, aii, 0).astype(u8)) must be bitwise equal
    to handing the kernel the prebuilt f32 reciprocal — on BOTH the
    whole-grid and the K-slab Mosaic paths (the in-kernel decode
    1/max(code,1) reproduces the XLA construction exactly)."""
    from tpu_fluid.kernels.jacobi import jacobi_sweeps_pallas
    n = 16
    key = jax.random.PRNGKey(11)
    k1, k2 = jax.random.split(key)
    code = jax.random.randint(k1, (n, n, n), 0, 7).astype(jnp.uint8)
    rd_f32 = jnp.where(code > 0,
                       1.0 / jnp.maximum(code.astype(jnp.float32), 1.0),
                       0.0)
    c2 = jax.random.normal(k2, (n, n, n), dtype=jnp.float32)
    q0 = jnp.where(code > 0, jnp.float32(1.0), 0.0)
    for whole in (True, False):
        got_u8 = jax.jit(lambda q: jacobi_sweeps_pallas(
            q, code, c2, 9, whole_grid=whole))(q0)
        got_f32 = jax.jit(lambda q: jacobi_sweeps_pallas(
            q, rd_f32, c2, 9, whole_grid=whole))(q0)
        np.testing.assert_array_equal(np.asarray(got_u8),
                                      np.asarray(got_f32))


def test_pallas_surface_2d_bitwise_matches_1d():
    """The 2D-(x,y)-blocked surface kernel (the large-plane single-device
    path) must be bitwise equal to the 1D x-slab kernel on real silicon —
    same per-cell op order, only the blocking differs."""
    from tpu_fluid.stages import surface_fields
    from tpu_fluid.kernels.surface_fused import (surface_fused_pallas,
                                                 surface_fused_2d, _tile2d)
    n = 16
    cfg = FluidConfig(grid_size=(n, n, n), surface_render_resolution=2,
                      solid_boxes=(((4, 4, 4), (8, 8, 8)),))
    d = cfg.detailed_size
    h = cfg.float_density_diffuse_steps + 1
    assert _tile2d(*d, h) is not None, "test size must admit a 2D tiling"
    key = jax.random.PRNGKey(12)
    k1, k2, k3 = jax.random.split(key, 3)
    occ = (jax.random.uniform(k1, d) < 0.3).astype(jnp.uint8)
    inertia = jax.random.randint(k2, d, 0, cfg.max_inertia + 1,
                                 dtype=jnp.int32)
    f2 = jax.random.normal(k3, d, dtype=jnp.float32)
    types = _types(n, jax.random.PRNGKey(13))
    skip = surface_fields.solid_parent_mask(types, cfg).astype(jnp.uint8)
    kw = dict(steps=cfg.float_density_diffuse_steps,
              k=cfg.float_density_diffuse_coefficient,
              inc_filled=cfg.inertia_increase_filled,
              inc_neigh=cfg.inertia_increase_neighbour,
              required_hits=cfg.inertia_required_neighbour_hits,
              dec=cfg.inertia_decrease, max_inertia=cfg.max_inertia,
              div_coef=cfg.float_density_division_coefficient)
    got1d = jax.jit(lambda o, i, f: surface_fused_pallas(
        o, i, f, skip, **kw))(occ, inertia, f2)
    got2d = jax.jit(lambda o, i, f: surface_fused_2d(
        o, i, f, skip, **kw))(occ, inertia, f2)
    for a, b in zip(got2d, got1d):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
