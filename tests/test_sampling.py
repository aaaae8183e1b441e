"""Unit tests for the staggered trilinear sampler — the contract the
reference gets from its Vulkan sampler (linear filtering, normalized coords,
clamp-to-edge, `fluid_flow_sections.h:94-95`) plus the half-texel stagger
offsets of `07_advect/advect.comp:37-59`."""

import numpy as np
import jax.numpy as jnp

import oracle
from tpu_fluid.ops.sampling import trilinear, velocity_at, \
    velocity_component_at


def test_trilinear_exact_at_texel_centers():
    r = np.random.default_rng(0)
    f = r.standard_normal((6, 7, 8)).astype(np.float32)
    # texel-space integer coords = exact texel values
    pts = np.array([[i, j, k] for i in range(6) for j in range(7)
                    for k in range(0, 8, 3)], dtype=np.float32)
    got = trilinear(jnp.asarray(f), jnp.asarray(pts))
    want = np.array([f[tuple(p.astype(int))] for p in pts])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_trilinear_midpoint():
    f = np.zeros((4, 4, 4), dtype=np.float32)
    f[1, 1, 1] = 1.0
    f[2, 1, 1] = 3.0
    got = trilinear(jnp.asarray(f), jnp.asarray([[1.5, 1.0, 1.0]]))
    np.testing.assert_allclose(np.asarray(got), [2.0], rtol=1e-6)


def test_trilinear_clamp_to_edge():
    r = np.random.default_rng(1)
    f = r.standard_normal((5, 5, 5)).astype(np.float32)
    # far outside in every direction: must clamp to corner texels
    got = trilinear(jnp.asarray(f),
                    jnp.asarray([[-3.0, -3.0, -3.0], [10.0, 10.0, 10.0]]))
    np.testing.assert_allclose(np.asarray(got), [f[0, 0, 0], f[4, 4, 4]],
                               rtol=1e-6)


def test_trilinear_matches_oracle_random_points():
    r = np.random.default_rng(2)
    f = r.standard_normal((6, 6, 6)).astype(np.float32)
    pts = (r.random((100, 3)) * 8 - 1).astype(np.float32)
    got = np.asarray(trilinear(jnp.asarray(f), jnp.asarray(pts)))
    want = np.array([oracle.sample_clamped(f, p) for p in pts])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_staggered_component_offsets():
    r = np.random.default_rng(3)
    vel = r.standard_normal((3, 6, 6, 6)).astype(np.float32)
    pts = (r.random((50, 3)) * 6).astype(np.float32)
    for c in range(3):
        got = np.asarray(velocity_component_at(jnp.asarray(vel),
                                               jnp.asarray(pts), c))
        want = np.array([oracle.velocity_comp_at(vel, p, c) for p in pts])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_velocity_vector():
    r = np.random.default_rng(4)
    vel = r.standard_normal((3, 5, 5, 5)).astype(np.float32)
    pts = (r.random((20, 3)) * 5).astype(np.float32)
    got = np.asarray(velocity_at(jnp.asarray(vel), jnp.asarray(pts)))
    want = np.stack([oracle.velocity_vec_at(vel, p) for p in pts])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_constant_field_everywhere():
    """A uniform staggered field must sample to the constant at any point,
    including near and beyond borders (clamp-to-edge)."""
    vel = jnp.stack([jnp.full((5, 5, 5), v) for v in (1.0, -2.0, 3.0)])
    r = np.random.default_rng(5)
    pts = jnp.asarray((r.random((40, 3)) * 9 - 2).astype(np.float32))
    got = np.asarray(velocity_at(vel, pts))
    np.testing.assert_allclose(got, np.tile([1.0, -2.0, 3.0], (40, 1)),
                               rtol=1e-6)
