"""Golden tests: every JAX stage vs the loop-based NumPy oracle on small
random states.  Random states are built to be physically plausible (solid
border, water blob, air shell) so all stage branches get exercised."""

import numpy as np
import pytest
import jax.numpy as jnp

import oracle
from tpu_fluid.core.config import FluidConfig
from tpu_fluid.core.types import CellType
from tpu_fluid.ops.scatter import particle_cell_histogram
from tpu_fluid.stages import celltypes, particles, pressure, surface_fields
from tpu_fluid.stages import velocity as vstages

N = 10
CFG = FluidConfig(grid_size=(N, N, N), particle_count=500,
                  particle_init_cube_resolution=(8, 8, 8),
                  particle_init_cube_offset=(2.0, 2.0, 2.0),
                  particle_init_cube_size=(5.0, 5.0, 5.0),
                  surface_render_resolution=2,
                  jacobi_iters=30)


def rng(seed=0):
    return np.random.default_rng(seed)


def random_types(r, shape=(N, N, N)):
    """Plausible cell-type field: random water blob, air shell, solid border."""
    dens = (r.random(shape) < 0.3).astype(np.int64)
    t = oracle.update_water(dens)
    return oracle.update_air(t)


def random_vel(r, shape=(N, N, N)):
    return r.standard_normal((3,) + shape).astype(np.float32)


def assert_close(jx, npx, **kw):
    np.testing.assert_allclose(np.asarray(jx), npx, **kw)


# ------------------------------------------------------------------ 00 / 01
def test_init_particles_matches_oracle():
    from tpu_fluid.core.state import init_particles
    pos, act = init_particles(CFG)
    opos, oact = oracle.init_particles(
        CFG.particle_count, CFG.particle_init_cube_resolution,
        CFG.particle_init_cube_offset, CFG.particle_init_cube_size)
    assert_close(act, oact)
    assert_close(pos, opos.astype(np.float32), rtol=1e-6)


def test_histogram_matches_oracle():
    r = rng(1)
    pos = (r.random((400, 3)) * (N + 2) - 1).astype(np.float32)
    act = r.random(400) < 0.8
    got = particle_cell_histogram(jnp.asarray(pos), jnp.asarray(act),
                                  (N, N, N))
    want = oracle.histogram(pos, act, (N, N, N))
    assert_close(got, want)


def test_histogram_detailed_scale():
    r = rng(2)
    pos = (r.random((300, 3)) * N).astype(np.float32)
    act = np.ones(300, dtype=bool)
    got = particles.detailed_densities(jnp.asarray(pos), jnp.asarray(act),
                                       CFG)
    want = oracle.histogram(pos, act, CFG.detailed_size,
                            scale=CFG.surface_render_resolution)
    assert_close(got, want)


def test_occupancy_heavy_duplication():
    """ADVICE r3: the occupancy scatter uses unique_indices=True on
    intentionally DUPLICATE indices (safe only because every duplicate
    writes the constant 1).  Pin that contract under heavy duplication so a
    backend-semantics change mis-rendering occupancy is caught: thousands of
    particles in one detailed cell must still read exactly 1 there and the
    untouched cells exactly 0."""
    r = rng(7)
    heavy = np.full((5000, 3), 3.25, np.float32)       # all one cell
    spread = (r.random((200, 3)) * N).astype(np.float32)
    pos = np.concatenate([heavy, spread])
    act = np.ones(len(pos), dtype=bool)
    occ = np.asarray(particles.detailed_occupancy(
        jnp.asarray(pos), jnp.asarray(act), CFG))
    want = (oracle.histogram(pos, act, CFG.detailed_size,
                             scale=CFG.surface_render_resolution) > 0)
    np.testing.assert_array_equal(occ.astype(bool), want)
    assert set(np.unique(occ)) <= {0, 1}


def test_histogram_deterministic():
    r = rng(3)
    pos = (r.random((1000, 3)) * N).astype(np.float32)
    act = np.ones(1000, dtype=bool)
    a = particle_cell_histogram(jnp.asarray(pos), jnp.asarray(act), (N, N, N))
    b = particle_cell_histogram(jnp.asarray(pos), jnp.asarray(act), (N, N, N))
    assert (np.asarray(a) == np.asarray(b)).all()


# ------------------------------------------------------------------ 02 / 03
def test_update_water():
    r = rng(4)
    dens = (r.random((N, N, N)) < 0.4).astype(np.int32) * \
        r.integers(1, 5, (N, N, N))
    got = celltypes.update_water(jnp.asarray(dens))
    assert_close(got, oracle.update_water(dens))


def test_update_air():
    r = rng(5)
    dens = (r.random((N, N, N)) < 0.3).astype(np.int64)
    t02 = oracle.update_water(dens)
    got = celltypes.update_air(jnp.asarray(t02))
    assert_close(got, oracle.update_air(t02))


# ------------------------------------------------------------------ 04 / 05
def test_compute_extrapolated():
    r = rng(6)
    types = random_types(r)
    vel = random_vel(r)
    got = vstages.compute_extrapolated_velocities(jnp.asarray(types),
                                                  jnp.asarray(vel))
    want = oracle.compute_extrapolated(types, vel)
    assert_close(got, want, rtol=1e-5, atol=1e-6)


def test_set_extrapolated():
    r = rng(7)
    old_t = random_types(r)
    new_t = random_types(rng(8))
    vel = random_vel(r)
    ext = random_vel(rng(9))
    got = vstages.set_extrapolated_velocities(
        jnp.asarray(old_t), jnp.asarray(new_t), jnp.asarray(vel),
        jnp.asarray(ext))
    want = oracle.set_extrapolated(old_t, new_t, vel, ext)
    assert_close(got, want, rtol=1e-6)


# ------------------------------------------------------------------ 07
def test_advect():
    r = rng(10)
    types = random_types(r)
    vel = random_vel(r) * 2.0
    got = vstages.advect(jnp.asarray(types), jnp.asarray(vel), CFG)
    want = oracle.advect(types, vel, CFG.dt)
    assert_close(got, want, rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------------ 08
def test_forces():
    r = rng(11)
    types = random_types(r)
    # make sure the fountain cell is wet so the branch fires
    f = CFG.fountain
    types[f] = CellType.WATER
    vel = random_vel(r)
    got = vstages.apply_forces(jnp.asarray(types), jnp.asarray(vel), CFG)
    want = oracle.forces(types, vel, CFG.dt, CFG.gravity, f,
                         CFG.fountain_force)
    assert_close(got, want, rtol=1e-5, atol=1e-6)


# ------------------------------------------------------------------ 09
def test_diffuse_reference_noop():
    r = rng(12)
    types = random_types(r)
    vel = random_vel(r)
    got = vstages.diffuse(jnp.asarray(types), jnp.asarray(vel), CFG)
    assert_close(got, vel)


def test_diffuse_real():
    cfg = CFG.replace(reference_diffuse_noop=False)
    r = rng(13)
    types = random_types(r)
    vel = random_vel(r)
    got = vstages.diffuse(jnp.asarray(types), jnp.asarray(vel), cfg)
    want = oracle.diffuse(types, vel, cfg.dt, cfg.diffusion_coefficient,
                          noop=False)
    assert_close(got, want, rtol=1e-5, atol=1e-6)


# ------------------------------------------------------------------ 10
def test_solids():
    r = rng(14)
    types = random_types(r)
    vel = random_vel(r) * 0.02  # exercise the |v| < repel branches
    got = vstages.apply_solids(jnp.asarray(types), jnp.asarray(vel), CFG)
    want = oracle.solids(types, vel, CFG.solid_repel_velocity)
    assert_close(got, want, rtol=1e-6)


# ------------------------------------------------------------------ 11-13
def test_divergence():
    r = rng(15)
    vel = random_vel(r)
    got = pressure.compute_divergence(jnp.asarray(vel))
    assert_close(got, oracle.divergence(vel), rtol=1e-5, atol=1e-6)


def test_jacobi():
    r = rng(16)
    types = random_types(r)
    vel = random_vel(r)
    div = oracle.divergence(vel).astype(np.float32)
    cfg = CFG.replace(jacobi_iters=8, reference_pressure_parity=False)
    got = pressure.jacobi_solve(jnp.asarray(types), jnp.asarray(div), cfg)
    want = oracle.jacobi(types, div, 8, cfg.dt, cfg.air_pressure,
                         cfg.cell_width, cfg.fluid_density)
    assert_close(got, want, rtol=1e-4, atol=1e-4)


def test_jacobi_parity_flag():
    r = rng(17)
    types = random_types(r)
    div = oracle.divergence(random_vel(r)).astype(np.float32)
    cfg = CFG.replace(jacobi_iters=8, reference_pressure_parity=True)
    got = pressure.jacobi_solve(jnp.asarray(types), jnp.asarray(div), cfg)
    want = oracle.jacobi(types, div, 7, cfg.dt, cfg.air_pressure,
                         cfg.cell_width, cfg.fluid_density)
    assert_close(got, want, rtol=1e-4, atol=1e-4)


def test_fix_divergence():
    r = rng(18)
    types = random_types(r)
    vel = random_vel(r)
    p = r.standard_normal((N, N, N)).astype(np.float32)
    got = pressure.pressure_project(jnp.asarray(types), jnp.asarray(p),
                                    jnp.asarray(vel), CFG)
    want = oracle.fix_divergence(types, p, vel, CFG.dt, CFG.cell_width,
                                 CFG.fluid_density)
    assert_close(got, want, rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------------ 14
def test_move_particles():
    r = rng(19)
    vel = random_vel(r)
    pos = (r.random((200, 3)) * N).astype(np.float32)
    act = r.random(200) < 0.7
    got = particles.move_particles(jnp.asarray(vel), jnp.asarray(pos),
                                   jnp.asarray(act), CFG)
    want = oracle.move_particles(vel, pos, act, CFG.dt)
    assert_close(got, want, rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------------ 16-18
def test_update_inertia():
    r = rng(20)
    shape = CFG.detailed_size
    dens = (r.random(shape) < 0.3).astype(np.int64) * \
        r.integers(1, 4, shape)
    inertia = r.integers(0, 101, shape)
    got = surface_fields.update_inertia(jnp.asarray(dens),
                                        jnp.asarray(inertia.astype(np.int32)),
                                        CFG)
    want = oracle.update_inertia(dens, inertia)
    assert_close(got, want)


def test_float_densities():
    r = rng(21)
    inertia = r.integers(0, 101, CFG.detailed_size).astype(np.int32)
    got = surface_fields.float_densities(jnp.asarray(inertia), CFG)
    want = oracle.float_densities(inertia)
    assert_close(got, want, rtol=1e-6)


def test_blur_float_densities():
    r = rng(22)
    types = random_types(r)
    shape = CFG.detailed_size
    f1 = r.standard_normal(shape).astype(np.float32)
    f2 = r.standard_normal(shape).astype(np.float32)
    g1, g2 = surface_fields.blur_float_densities(
        jnp.asarray(types), jnp.asarray(f1), jnp.asarray(f2), CFG)
    w1, w2 = oracle.blur_float_densities(
        types, f1, f2, CFG.float_density_diffuse_steps,
        CFG.float_density_diffuse_coefficient, CFG.surface_render_resolution)
    assert_close(g1, w1, rtol=1e-4, atol=1e-5)
    assert_close(g2, w2, rtol=1e-4, atol=1e-5)
