"""Simulation state pytree.

Replaces the reference's 12 GPU images + 4 buffers (`fluid_flow_sections.h:
36-92`, README table) with a functional pytree of `jnp` arrays.  Only the
arrays that persist *across* frames live here; everything the reference
ping-pongs inside a frame (VELOCITIES_2, NEW_CELL_TYPES, PRESSURES_1/2,
DIVERGENCES, the density histograms) is a pure intermediate of the step
function and never materializes in the state.

Persistent arrays (matching the reference's cross-frame state):
  velocity    (3, X, Y, Z) f32  — staggered MAC velocities; component i of
                                   cell c lives at the center of c's lower
                                   face in dim i (VELOCITIES_1,
                                   fluid_flow_sections.h:36)
  cell_types  (X, Y, Z)  uint8  — CellType codes (CELL_TYPES, :40)
  inertia     (DX,DY,DZ) uint8  — detailed-density temporal inertia
                (int32 when max_inertia > 255 — cfg.inertia_dtype),
                                   persistent (DETAILED_DENSITIES_INERTIA_IMG,
                                   :53)
  float_dens_1/2 (DX,DY,DZ) f32 — signed density ping-pong pair; both persist
                                   because the reference's blur skips writes
                                   under solid parents, so stale values carry
                                   across frames (PARTICLE_DENSITIES_FLOAT_1/2,
                                   :55-56)
  positions   (P, 3) f32        — marker particle positions (PARTICLES_BUF, :72)
  active      (P,)   bool       — particle activity flag (reference packs this
                                   into the position's w component,
                                   simulation_constants.h:53)
  step        ()     int32      — frame counter (new; reference has none)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.core.types import CellType


class FluidState(NamedTuple):
    velocity: jax.Array      # (3, X, Y, Z) float32
    cell_types: jax.Array    # (X, Y, Z)    uint8
    inertia: jax.Array       # detailed grid, cfg.inertia_dtype (u8/i32)
    float_dens_1: jax.Array  # detailed grid, float32
    float_dens_2: jax.Array  # detailed grid, float32
    positions: jax.Array     # (P, 3) float32
    active: jax.Array        # (P,)   bool
    detailed_occ: jax.Array  # detailed grid, uint8 — particle occupancy of
    #                          the CURRENT positions.  Carried across frames
    #                          so one scatter per step serves both the
    #                          reference's stage-01 (pre-move, == last
    #                          frame's post-move) and stage-15 histograms;
    #                          the pipeline only ever consumes density > 0.
    step: jax.Array          # ()     int32
    dropped: jax.Array       # ()     int32 — cumulative particles lost to
    #                          bounded-capacity overflow on the domain-
    #                          sharded particle path (migration buffers /
    #                          slot exhaustion, parallel/particles_domain).
    #                          Always 0 on the single-device and index-
    #                          sharded paths; the reference's analogue is
    #                          particles silently escaping the box.


def init_particles(cfg: FluidConfig) -> tuple[jax.Array, jax.Array]:
    """Stage 00: spawn the initial particle blob(s).

    Faithful to `00_init_particles/init_particles.comp:27-49` for each cube:
    particle id i (relative to the cube's id range) maps to cube index
    (x = i % rx, y = (i/rx) % ry, z = i/(rx*ry)); position = offset +
    idx/res * size.  Cubes take consecutive id ranges (the primary cube
    first, then cfg.extra_particle_cubes); leftover ids are inactive — the
    reference's single-cube rule `ids >= cube volume -> inactive`,
    generalized to multi-body scenes.
    """
    p = cfg.particle_count
    cubes = [(cfg.particle_init_cube_resolution,
              cfg.particle_init_cube_offset,
              cfg.particle_init_cube_size)]
    cubes += list(cfg.extra_particle_cubes)

    ids = jnp.arange(p, dtype=jnp.uint32)
    pos = jnp.zeros((p, 3), dtype=jnp.float32)
    active = jnp.zeros((p,), dtype=bool)
    start = 0
    for (rx, ry, rz), offset, size_ in cubes:
        vol = rx * ry * rz
        rel = ids - jnp.uint32(start)
        x = rel % rx
        y = (rel // rx) % ry
        z = (rel // (rx * ry)) % rz
        idx = jnp.stack([x, y, z], axis=-1).astype(jnp.float32)
        res = jnp.array([rx, ry, rz], dtype=jnp.float32)
        off = jnp.array(offset, dtype=jnp.float32)
        size = jnp.array(size_, dtype=jnp.float32)
        in_cube = (ids >= start) & (ids < start + vol)
        pos = jnp.where(in_cube[:, None], off + idx / res * size, pos)
        active = active | in_cube
        start += vol
    return pos.astype(cfg.jnp_dtype), active


def initial_state(cfg: FluidConfig) -> FluidState:
    """Allocate + initialize all state — one jitted program.

    Eagerly, the clears + particle spawn dispatch dozens of tiny ops; on a
    remote-compile TPU runtime each eager op pays a compile round trip
    (measured 18.9 s of wall for this function at the 128^3 bench config).
    One jit makes it a single (persistent-cacheable) program."""
    return _initial_state_jitted(cfg)


def _initial_state(cfg: FluidConfig) -> FluidState:
    """Allocate + initialize all state.

    Mirrors the reference's init command buffer (`main.cpp:108-122`): clear
    velocities, cell types (INACTIVE) and inertia, then run the particle-spawn
    kernel.  float_dens buffers start at zero (fresh device allocations).
    """
    from tpu_fluid.stages.particles import detailed_occupancy

    gx, gy, gz = cfg.grid_size
    dx, dy, dz = cfg.detailed_size
    dt = cfg.jnp_dtype
    pos, active = init_particles(cfg)
    return FluidState(
        velocity=jnp.zeros((3, gx, gy, gz), dtype=dt),
        cell_types=jnp.full((gx, gy, gz), CellType.INACTIVE, dtype=jnp.uint8),
        inertia=jnp.zeros((dx, dy, dz), dtype=cfg.inertia_dtype),
        float_dens_1=jnp.zeros((dx, dy, dz), dtype=dt),
        float_dens_2=jnp.zeros((dx, dy, dz), dtype=dt),
        positions=pos,
        active=active,
        detailed_occ=detailed_occupancy(pos, active, cfg),
        step=jnp.zeros((), dtype=jnp.int32),
        dropped=jnp.zeros((), dtype=jnp.int32),
    )


_initial_state_jitted = jax.jit(_initial_state, static_argnums=0)


def state_bytes(state: FluidState) -> int:
    """Total device bytes held by the persistent state."""
    return sum(int(np.prod(a.shape)) * a.dtype.itemsize
               for a in jax.tree.leaves(state))
