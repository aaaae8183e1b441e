"""The occupancy fast path must classify cells exactly like the reference's
count histograms (only density > 0 is ever consumed downstream)."""

import numpy as np
import jax.numpy as jnp

import oracle
from tpu_fluid.core.config import FluidConfig
from tpu_fluid.stages import particles

CFG = FluidConfig(grid_size=(10, 10, 10), surface_render_resolution=3,
                  jacobi_iters=5)


def test_occupancy_equals_histogram_positivity():
    r = np.random.default_rng(0)
    pos = (r.random((5000, 3)) * 11 - 0.2).astype(np.float32)
    pos = np.abs(pos)  # keep >= 0: trunc-toward-zero == floor there
    act = r.random(5000) < 0.9
    occ = particles.detailed_occupancy(jnp.asarray(pos), jnp.asarray(act),
                                       CFG)
    hist = oracle.histogram(pos, act, CFG.detailed_size,
                            scale=CFG.surface_render_resolution)
    np.testing.assert_array_equal(np.asarray(occ) > 0, hist > 0)


def test_sim_grid_pool_equals_sim_histogram_positivity():
    r = np.random.default_rng(1)
    pos = (r.random((4000, 3)) * 10).astype(np.float32)
    act = np.ones(4000, dtype=bool)
    occ = particles.detailed_occupancy(jnp.asarray(pos), jnp.asarray(act),
                                       CFG)
    sim_occ = particles.occupancy_to_sim_grid(occ, CFG)
    hist = oracle.histogram(pos, act, CFG.grid_size)
    np.testing.assert_array_equal(np.asarray(sim_occ) > 0, hist > 0)


def test_out_of_bounds_dropped_consistently():
    pos = np.array([[5.0, 5.0, 5.0], [10.5, 5.0, 5.0], [5.0, -2.0, 5.0],
                    [9.999, 9.999, 9.999]], dtype=np.float32)
    act = np.ones(4, dtype=bool)
    occ = particles.detailed_occupancy(jnp.asarray(pos), jnp.asarray(act),
                                       CFG)
    sim_occ = np.asarray(particles.occupancy_to_sim_grid(occ, CFG))
    assert sim_occ[5, 5, 5] == 1
    assert sim_occ[9, 9, 9] == 1
    assert sim_occ.sum() == 2  # OOB particles contribute nothing
