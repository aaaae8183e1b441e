"""Velocity-field stages: extrapolation (04/05), advection (07), forces (08),
diffusion (09), solid handling (10).

Reference shaders cited per function.  All fields are (3, X, Y, Z) staggered
MAC velocities; component c of cell i lives on the lower face of i in dim c.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.core.types import CellType
from tpu_fluid.ops.sampling import velocity_at, velocity_component_at
from tpu_fluid.ops.stencil import MOVES, shifted


def _is_active(types: jnp.ndarray) -> jnp.ndarray:
    return (types == CellType.WATER) | (types == CellType.AIR)


def _cell_centers(shape, dtype=jnp.float32):
    gx, gy, gz = shape
    ix = jnp.arange(gx, dtype=dtype)[:, None, None]
    iy = jnp.arange(gy, dtype=dtype)[None, :, None]
    iz = jnp.arange(gz, dtype=dtype)[None, None, :]
    return jnp.broadcast_to(
        jnp.stack(jnp.broadcast_arrays(ix, iy, iz), axis=-1), (gx, gy, gz, 3))


def compute_extrapolated_velocities(old_types: jnp.ndarray,
                                    vel: jnp.ndarray) -> jnp.ndarray:
    """Stage 04: per cell, the average velocity of its (<=6) WATER neighbors
    under the *old* cell types; zero if none
    (`04_…/extrapolated_velocities.comp:37-63`).

    The shader's `i.x != 0 && …` border guards are subsumed by zero-padded
    shifts: an out-of-bounds neighbor is never WATER, so it never counts.
    """
    water = old_types == CellType.WATER
    vsum = jnp.zeros_like(vel)
    count = jnp.zeros(old_types.shape, dtype=vel.dtype)
    for mv in MOVES:
        w = shifted(water, mv, fill=False)
        count = count + w
        vsum = vsum + shifted(vel, mv) * w
    return jnp.where(count > 0, vsum / jnp.maximum(count, 1), 0.0)


def set_extrapolated_velocities(old_types: jnp.ndarray,
                                new_types: jnp.ndarray,
                                vel: jnp.ndarray,
                                extrapolated: jnp.ndarray) -> jnp.ndarray:
    """Stage 05: per staggered component, a face velocity is "active" iff
    either adjacent cell is WATER or AIR; state machine was/is ->
    keep / reset to 0 / take extrapolated (`05_…/extrapolate_velocities.comp:
    43-109`).  Out-of-grid lower neighbors read as INACTIVE (GLSL OOB load).
    """
    was_here = _is_active(old_types)
    is_here = _is_active(new_types)
    out = []
    for c in range(3):
        mv = tuple(-1 if k == c else 0 for k in range(3))
        was = was_here | shifted(was_here, mv, fill=False)
        is_ = is_here | shifted(is_here, mv, fill=False)
        comp = jnp.where(was & ~is_, 0.0,
                         jnp.where(~was & is_, extrapolated[c], vel[c]))
        out.append(comp)
    return jnp.stack(out)


def advect(types: jnp.ndarray, vel: jnp.ndarray,
           cfg: FluidConfig) -> jnp.ndarray:
    """Stage 07: semi-Lagrangian advection, per staggered component
    (`07_advect/advect.comp:52-97`).

    For component c at cell i: if i_c != 0 and (cell i is WATER or cell
    i + e_c is WATER — the reference checks the *upper* neighbor,
    `advect.comp:66-71`): sample the full velocity at the face center,
    backtrace x - v*dt, resample component c there; else keep.
    """
    water = types == CellType.WATER
    base = _cell_centers(types.shape, vel.dtype)
    out = []
    for c in range(3):
        up = tuple(1 if k == c else 0 for k in range(3))
        cond = water | shifted(water, up, fill=False)
        idx = jnp.arange(types.shape[c])
        nonzero = (idx != 0).reshape(
            tuple(-1 if k == c else 1 for k in range(3)))
        cond = cond & nonzero

        fmove = jnp.array([0.5 if k != c else 0.0 for k in range(3)],
                          dtype=vel.dtype)
        pos = base + fmove                      # face center of component c
        cur_v = velocity_at(vel, pos)
        back = pos - cur_v * cfg.dt
        sampled = velocity_component_at(vel, back, c)
        out.append(jnp.where(cond, sampled, vel[c]))
    return jnp.stack(out)


def apply_forces(types: jnp.ndarray, vel: jnp.ndarray,
                 cfg: FluidConfig) -> jnp.ndarray:
    """Stage 08: gravity on active y-faces plus the fountain impulse
    (`08_forces/forces.comp:33-55`).  +y is down in the reference scene
    (camera up is {0,-1,0}, main.cpp:128)."""
    water = types == CellType.WATER
    wet_face = water | shifted(water, (0, -1, 0), fill=False)
    gy = types.shape[1]
    ynz = (jnp.arange(gy) != 0).reshape(1, -1, 1)

    force = jnp.where(wet_face & ynz, cfg.gravity, 0.0).astype(vel.dtype)

    fx, fy, fz = cfg.fountain
    fountain = jnp.zeros(types.shape, dtype=bool).at[fx, fy, fz].set(True)
    force = force + jnp.where(fountain & wet_face, cfg.fountain_force,
                              0.0).astype(vel.dtype)

    return vel.at[1].add(cfg.dt * force)


def diffuse(types: jnp.ndarray, vel: jnp.ndarray,
            cfg: FluidConfig) -> jnp.ndarray:
    """Stage 09: velocity diffusion on WATER cells,
    v' = (1 - 6*k*dt)*v + k*dt * sum of 6 neighbors
    (`09_diffuse/diffuse.comp:31-47`).

    The reference shader assigns the result to a scope-shadowed local
    (`diffuse.comp:40`), making the stage an effective copy;
    `cfg.reference_diffuse_noop` (default True) reproduces that.
    """
    if cfg.reference_diffuse_noop:
        return vel
    k = cfg.diffusion_coefficient * cfg.dt
    nsum = jnp.zeros_like(vel)
    for mv in MOVES:
        nsum = nsum + shifted(vel, mv)
    diffused = (1.0 - 6.0 * k) * vel + k * nsum
    water = types == CellType.WATER
    return jnp.where(water[None], diffused, vel)


def apply_solids(types: jnp.ndarray, vel: jnp.ndarray,
                 cfg: FluidConfig) -> jnp.ndarray:
    """Stage 10: solid-cell velocity clamping (`10_solids/solids.comp:30-77`).

    For SOLID cells, every component flowing in faster than -repel is set to
    -repel; for any cell whose lower neighbor in dim c is SOLID, component c
    slower than +repel is set to +repel (pushes fluid out of walls; the small
    nonzero constant prevents particles sticking, simulation_constants.h:89).
    """
    r = jnp.asarray(cfg.solid_repel_velocity, dtype=vel.dtype)
    solid = types == CellType.SOLID
    out = []
    for c in range(3):
        v = vel[c]
        v = jnp.where(solid & (v > -r), -r, v)
        mv = tuple(-1 if k == c else 0 for k in range(3))
        lower_solid = shifted(solid, mv, fill=False)
        v = jnp.where(lower_solid & (v < r), r, v)
        out.append(v)
    return jnp.stack(out)
