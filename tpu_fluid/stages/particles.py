"""Particle stages: grid histograms (01, 15) and particle advection (14).

Reference: `01_update_densities/update_densities.comp`,
`14_particles/particles.comp`, `15_update_detailed_densities/
update_detailed_densities.comp`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.ops.sampling import velocity_at
from tpu_fluid.ops.scatter import particle_cell_histogram


def particle_densities(positions: jnp.ndarray, active: jnp.ndarray,
                       cfg: FluidConfig) -> jnp.ndarray:
    """Stage 01: particles-per-cell histogram on the sim grid
    (`update_densities.comp:29-36`)."""
    return particle_cell_histogram(positions, active, cfg.grid_size)


def detailed_occupancy(positions: jnp.ndarray, active: jnp.ndarray,
                       cfg: FluidConfig) -> jnp.ndarray:
    """Occupancy (0/1 uint8) of the detailed grid — one scatter-max instead
    of a full histogram.

    Perf rationale: TPU scatter cost is bound by the number of update
    requests (~10 ns each for 1M particles), and the pipeline only ever
    consumes `density > 0` — stage 02's water test
    (`update_water.comp:28`) and stage 16's filled/neighbor tests
    (`densities_inertia.comp:40,50`) — never the actual counts.  One
    occupancy scatter on the fine grid therefore replaces both of the
    reference's histogram dispatches (01 and 15): the sim-grid water mask is
    the res^3 block-OR of this field (floor(p) == floor(floor(p*res)/res)).
    """
    dx, dy, dz = cfg.detailed_size
    p = positions * float(cfg.surface_render_resolution)
    idx = jnp.trunc(p).astype(jnp.int32)
    x, y, z = idx[..., 0], idx[..., 1], idx[..., 2]
    inb = ((x >= 0) & (x < dx) & (y >= 0) & (y < dy) & (z >= 0) & (z < dz)
           & active)
    # scatter-SET of the constant 1 with OOB-drop routing: measured fastest
    # scatter form on TPU (no read-modify-write); int32 beats uint8.
    # unique_indices=True is semantically safe because every duplicate
    # writes the same constant — but it buys no time: the TPU scatter
    # emitter sorts regardless (unique_indices / promise_in_bounds / sorted
    # variants all measured identical, NOTES.md round-3 trace: 5.92 ms
    # scatter + 0.95 ms internal sort at 1M particles).  Kept because it
    # declares the duplicate-set intent.
    flat = jnp.where(inb, x * (dy * dz) + y * dz + z, dx * dy * dz)
    occ = jnp.zeros((dx * dy * dz,), dtype=jnp.int32)
    occ = occ.at[flat].set(1, mode="drop", unique_indices=True)
    return occ.reshape(dx, dy, dz).astype(jnp.uint8)


def occupancy_to_sim_grid(occ: jnp.ndarray, cfg: FluidConfig) -> jnp.ndarray:
    """Sim-grid occupancy = block-OR (max-pool) of detailed occupancy over
    each res^3 block.

    Implemented with reduce_window: the reshape-to-(gx,r,gy,r,gz,r) form
    makes XLA materialize minor-dim-r intermediates padded to full tiles
    (measured 2.2 GB of traffic at 256^3 detailed for r=2)."""
    r = cfg.surface_render_resolution
    return jax.lax.reduce_window(occ, jnp.uint8(0), jax.lax.max,
                                 (r, r, r), (r, r, r), "VALID")


def detailed_densities(positions: jnp.ndarray, active: jnp.ndarray,
                       cfg: FluidConfig) -> jnp.ndarray:
    """Stage 15: particles-per-cell histogram on the detailed (surface) grid,
    indexed by pos * detailed_resolution
    (`update_detailed_densities.comp:24-32`)."""
    return particle_cell_histogram(
        positions, active, cfg.detailed_size,
        scale=float(cfg.surface_render_resolution))


def move_particles(vel: jnp.ndarray, positions: jnp.ndarray,
                   active: jnp.ndarray, cfg: FluidConfig) -> jnp.ndarray:
    """Stage 14: forward-Euler particle advection with staggered trilinear
    velocity sampling (`particles.comp:27-52`).  No position clamping —
    containment relies on stage 10's solid repel velocities, as in the
    reference.

    The default "packed" sampler does one 64-lane row gather per particle
    from a precomputed per-cell neighborhood table instead of 24 scalar
    gathers (~30x faster on TPU; see ops/packed_sampler.py).
    """
    from tpu_fluid.kernels import pallas_choice
    if cfg.particle_sampler == "packed":
        from tpu_fluid.ops.packed_sampler import (build_packed_table,
                                                  packed_row_indices,
                                                  sample_velocity_packed)
        use_pallas, interpret = pallas_choice(cfg)
        if use_pallas:
            # build the table and fuse weights + Euler update in Pallas;
            # the row gather itself stays an XLA gather.  Even-Z grids use
            # the z-halves-paired 128-lane table (half the rows, full-tile
            # writes: 1.49 vs 1.77 ms table build at 128^3; gather time
            # identical), with the half-select fused into the sample
            # kernel.
            from tpu_fluid.kernels.pack_table import (
                build_packed_table_pallas, build_packed_table_pallas2)
            from tpu_fluid.kernels.particle_sample import sample_and_move
            from tpu_fluid.ops.packed_sampler import packed_row_indices2
            # paired path gated to gz >= 128: Mosaic rejects the z-halves
            # lane concat on narrow halves ("result/input offset mismatch
            # on non-concat dimension" at gz=16)
            if (cfg.packed_pair_z and cfg.grid_size[2] % 2 == 0
                    and cfg.grid_size[2] >= 128):
                table = build_packed_table_pallas2(vel, interpret=interpret)
                idx = packed_row_indices2(positions, cfg.grid_size)
            else:
                table = build_packed_table_pallas(vel, interpret=interpret)
                idx = packed_row_indices(positions, cfg.grid_size)
            # mode="clip": packed_row_indices is in-bounds by construction;
            # the default fill mode adds a 1.5 ms select over the (P, 64)
            # gather output (measured in the 128^3 trace; clip itself is
            # free).  Indices stay UNPADDED: a pad fused into the gather
            # knocks it off its fast path (7.9 -> 13.5 ms measured).
            rows = jnp.take(table, idx, axis=0, mode="clip")
            new_t = sample_and_move(rows, positions.T, active,
                                    cfg.grid_size, cfg.dt,
                                    interpret=interpret)
            return new_t.T
        table = build_packed_table(vel)
        v = sample_velocity_packed(table, cfg.grid_size, positions)
    else:
        v = velocity_at(vel, positions)
    return jnp.where(active[:, None], positions + v * cfg.dt, positions)
