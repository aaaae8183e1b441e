"""Real-silicon execution of the multi-chip program form (VERDICT r4 #2).

Everything multi-chip in this repo is otherwise validated through the
Pallas interpreter on a virtual CPU mesh; this module compiles and runs the
EXACT multi-chip program — `parallel/spmd_step.spmd_step` under shard_map
with ppermute halo plumbing, the sharded K-fused Jacobi
(`kernels/jacobi.jacobi_sweeps_sharded`), and the domain-sharded particle
path (`parallel/particles_domain`: census-sized slots, slab-local
sampling/scatter, cumsum-ranked `migrate`) — through real Mosaic/XLA-TPU on
a 1-device mesh, and pins it against the single-device program.  The
repo's NOTES document several behaviors that only surfaced on silicon
(i1-relayout rejections, lane-concat limits, the (·,32) gather anomaly), so
interpreter evidence alone is not enough for this path.

Run with:  TPU_FLUID_TPU_TESTS=1 python -m pytest tests/tpu -q
(self-skips off-TPU).

Reference anchor: the barrier-separated solve loop this decomposition
generalizes, `/root/reference/fluid_flow_sections.h:300-313`.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="requires TPU hardware")

from tpu_fluid.core.config import FluidConfig            # noqa: E402


def _cfg(**kw):
    d = dict(
        grid_size=(32, 16, 16),
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


def _active_sorted(pos, act):
    pos = np.asarray(jax.device_get(pos))
    act = np.asarray(jax.device_get(act))
    rows = pos[act]
    return rows[np.lexsort(rows.T[::-1])]


def _run_pair(cfg, n_steps=3):
    """(single-device program state, 1-device-mesh SPMD program state)."""
    from tpu_fluid.core.state import initial_state
    from tpu_fluid.parallel.mesh import make_mesh, shard_state
    from tpu_fluid.parallel.particles_domain import domain_shard_state
    from tpu_fluid.parallel.spmd_step import spmd_step
    from tpu_fluid.solver.step import simulation_step

    ref = initial_state(cfg)
    step1 = jax.jit(simulation_step, static_argnums=1)
    for _ in range(n_steps):
        ref = step1(ref, cfg)

    mesh = make_mesh(1)
    if cfg.particle_sharding == "domain":
        sh = domain_shard_state(initial_state(cfg), mesh, cfg)
    else:
        sh = shard_state(initial_state(cfg), mesh)
    stepn = spmd_step(mesh, cfg, donate=False)
    for _ in range(n_steps):
        sh = stepn(sh)
    jax.block_until_ready(sh)
    return ref, sh


def _assert_parity(ref, sh):
    # integer state must be exact: classification, occupancy, inertia
    for name in ("cell_types", "inertia", "detailed_occ", "step"):
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(getattr(ref, name))),
            np.asarray(jax.device_get(getattr(sh, name))), err_msg=name)
    assert int(jax.device_get(sh.dropped)) == 0
    # grids: the sharded kernels perform the same per-cell ops; allow the
    # same 1-ULP contraction slack the CPU-mesh suite documents
    # (tests/test_spmd_step.assert_states_match) in case Mosaic contracts
    # mul+add differently across the two compiled program forms
    for name in ("velocity", "float_dens_1", "float_dens_2"):
        np.testing.assert_allclose(
            np.asarray(jax.device_get(getattr(ref, name))),
            np.asarray(jax.device_get(getattr(sh, name))),
            rtol=3e-7, atol=3e-7, err_msg=name)
    # particles: domain sharding repacks the buffer (census slots, migrate
    # reorders by scatter rank) — compare as sorted coordinate sets
    a = _active_sorted(ref.positions, ref.active)
    b = _active_sorted(sh.positions, sh.active)
    assert a.shape == b.shape, (a.shape, b.shape)
    np.testing.assert_allclose(a, b, rtol=3e-7, atol=3e-7,
                               err_msg="positions")


def test_spmd_domain_program_on_silicon():
    """shard_map + jacobi_sweeps_sharded + domain particles (slab-local
    sampling, migrate) compiled by real Mosaic, vs the single-device
    program."""
    ref, sh = _run_pair(_cfg(particle_sharding="domain"))
    _assert_parity(ref, sh)


def test_spmd_index_program_on_silicon():
    """The index-sharded particle variant (all_gather + psum_scatter path)
    through real XLA-TPU collectives on the 1-device mesh."""
    ref, sh = _run_pair(_cfg(particle_sharding="index"))
    _assert_parity(ref, sh)
