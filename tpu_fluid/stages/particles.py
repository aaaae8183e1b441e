"""Particle stages: grid histograms (01, 15) and particle advection (14).

Reference: `01_update_densities/update_densities.comp`,
`14_particles/particles.comp`, `15_update_detailed_densities/
update_detailed_densities.comp`.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.ops.sampling import velocity_at
from tpu_fluid.ops.scatter import particle_cell_histogram


def particle_densities(positions: jnp.ndarray, active: jnp.ndarray,
                       cfg: FluidConfig) -> jnp.ndarray:
    """Stage 01: particles-per-cell histogram on the sim grid
    (`update_densities.comp:29-36`)."""
    return particle_cell_histogram(positions, active, cfg.grid_size)


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
    reference."""
    v = velocity_at(vel, positions)
    return jnp.where(active[:, None], positions + v * cfg.dt, positions)
