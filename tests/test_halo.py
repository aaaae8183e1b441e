"""Explicit shard_map + ppermute halo-exchange Jacobi vs the single-device
solve, on the 8-way virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.core.types import CellType
from tpu_fluid.parallel.halo import exchange_x_halo, jacobi_solve_halo
from tpu_fluid.parallel.mesh import make_mesh
from tpu_fluid.stages.pressure import jacobi_solve

N = 16
CFG = FluidConfig(grid_size=(N, N, N), jacobi_iters=25)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def _scene(seed=0):
    key = jax.random.PRNGKey(seed)
    t = jnp.where(jax.random.uniform(key, (N, N, N)) < 0.35,
                  jnp.uint8(CellType.WATER), jnp.uint8(CellType.INACTIVE))
    ix = jnp.arange(N)
    border = ((ix[:, None, None] % (N - 1) == 0)
              | (ix[None, :, None] % (N - 1) == 0)
              | (ix[None, None, :] % (N - 1) == 0))
    t = jnp.where(border, jnp.uint8(CellType.SOLID), t)
    div = jax.random.normal(jax.random.PRNGKey(seed + 1), (N, N, N),
                            dtype=jnp.float32)
    return t, div


def test_exchange_x_halo(mesh):
    from jax.sharding import PartitionSpec as P
    x = jnp.arange(32.0 * 4 * 4).reshape(32, 4, 4)

    def f(loc):
        return exchange_x_halo(loc)

    g = jax.shard_map(f, mesh=mesh, in_specs=P("x"),
                      out_specs=P("x"))
    out = np.asarray(g(x))            # (8 shards * 6, 4, 4)
    out = out.reshape(8, 6, 4, 4)
    xs = np.asarray(x).reshape(8, 4, 4, 4)
    for s in range(8):
        np.testing.assert_array_equal(out[s, 1:5], xs[s])
        if s > 0:
            np.testing.assert_array_equal(out[s, 0], xs[s - 1, -1])
        else:
            assert (out[s, 0] == 0).all()
        if s < 7:
            np.testing.assert_array_equal(out[s, 5], xs[s + 1, 0])
        else:
            assert (out[s, 5] == 0).all()


def test_halo_jacobi_matches_single_device(mesh):
    types, div = _scene()
    want = np.asarray(jax.jit(
        lambda t, d: jacobi_solve(t, d, CFG))(types, div))
    got = np.asarray(jax.device_get(jacobi_solve_halo(mesh, types, div,
                                                      CFG)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
