"""Volume-conservation density projection (beyond-reference, flag-gated).

The reference documents a known artifact (`README.md:147-149`): splashed
particles create low-density water cells, mixing lowers the average cell
density over time, and the fluid volume slowly expands.  Its README's
stated future fix (`README.md:162`) is to "push excess particles from cells
to neighboring ones with lower density"; its own attempt (a hard local
density cap) caused "weird shaking movement".

Local rules can't fix a global imbalance (both a plain down-gradient drift
and a smooth excess-only cap were measured ~neutral here), so this stage
solves the problem the way the pressure stage solves divergence — as a
POISSON PROJECTION (cf. implicit density projection, Kugelstadt et al.
2019).  Per step, with per-cell particle counts d and target density d0:

    err  = (d - d0) / d0                     on WATER cells
    lap(phi) = err,  phi = 0 on non-water    (stage-12 Jacobi machinery,
                                              stages/pressure.poisson_solve)
    drift_c(i) = k * (phi(i) - phi(i - e_c)) on non-solid fluid faces,
                                              clamped to +-drift_max

phi is negative inside over-dense regions and zero at the free surface, so
+grad(phi) transports excess outward — through the incompressible bulk and
across the surface (raising the level), and INTO under-dense splash cells —
a global redistribution local drifts can't express.  The drift is added to
the velocity field ONLY for stage 14's particle sampling; the solver's
divergence-free field in the state is untouched.  Enable with
`FluidConfig.volume_correction = k` (0 = off = reference behavior)."""

from __future__ import annotations

import jax.numpy as jnp

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.core.types import CellType
from tpu_fluid.ops.scatter import particle_cell_histogram
from tpu_fluid.ops.stencil import shifted
from tpu_fluid.stages import pressure


def volume_potential(counts: jnp.ndarray, types: jnp.ndarray,
                     cfg: FluidConfig,
                     axis_name: str | None = None) -> jnp.ndarray:
    """Solve lap(phi) = density error on water cells (phi = 0 elsewhere).

    `axis_name`: set to the mesh axis when counts/types are LOCAL x-slab
    blocks inside shard_map — the solve then runs distributed with ppermute
    halo exchange per sweep, exactly like the pressure solve it reuses."""
    d0 = cfg.volume_target_density_value
    water = types == CellType.WATER
    err = jnp.where(water, (counts.astype(jnp.float32) - d0) / d0, 0.0)
    return pressure.poisson_solve(types, err, cfg,
                                  iters=cfg.volume_jacobi_iters,
                                  boundary_value=0.0, axis_name=axis_name)


def density_drift(counts: jnp.ndarray, types: jnp.ndarray,
                  cfg: FluidConfig,
                  axis_name: str | None = None, x0=0) -> jnp.ndarray:
    """(X,Y,Z) counts + types -> (3,X,Y,Z) staggered drift velocities.

    With `axis_name` (inside shard_map over x-slabs), counts/types are local
    blocks: the Poisson solve runs distributed, the radius-1 drift stencil
    exchanges one halo plane, and the face rule's `i_c != 0` test uses the
    GLOBAL x coordinate `x0 + i`."""
    k = cfg.volume_correction
    m = cfg.volume_drift_max
    phi = volume_potential(counts, types, cfg, axis_name=axis_name)
    water = types == CellType.WATER
    solid = types == CellType.SOLID
    if axis_name is not None:
        from tpu_fluid.parallel.halo import halo_extend, halo_inner
        types_e = halo_extend(types, 1, axis_name)
        phi_e = halo_extend(phi, 1, axis_name)
        water_e = types_e == CellType.WATER
        solid_e = types_e == CellType.SOLID
    out = []
    for c in range(3):
        mv = tuple(-1 if j == c else 0 for j in range(3))
        if axis_name is not None and c == 0:
            # x-shift reads the -x neighbor shard's boundary plane (zeros
            # past the domain end — same as `shifted`'s fill)
            lo_w = halo_inner(shifted(water_e, mv, fill=False))
            lo_s = halo_inner(shifted(solid_e, mv, fill=False))
            grad = phi - halo_inner(shifted(phi_e, mv))
            nonzero = ((x0 + jnp.arange(types.shape[0])) != 0
                       ).reshape(-1, 1, 1)
        else:
            lo_w = shifted(water, mv, fill=False)
            lo_s = shifted(solid, mv, fill=False)
            grad = phi - shifted(phi, mv)
            idx = jnp.arange(types.shape[c])
            nonzero = (idx != 0).reshape(
                tuple(-1 if j == c else 1 for j in range(3)))
        # same face rule as the pressure projection (fix_divergence.comp)
        ok = nonzero & (water | lo_w) & ~solid & ~lo_s
        drift = jnp.clip(k * grad, -m, m)
        out.append(jnp.where(ok, drift, 0.0))
    return jnp.stack(out)


def corrected_move_velocity(vel: jnp.ndarray, positions: jnp.ndarray,
                            active: jnp.ndarray, types: jnp.ndarray,
                            cfg: FluidConfig) -> jnp.ndarray:
    """The field stage 14 should sample: vel plus the volume drift."""
    counts = particle_cell_histogram(positions, active, cfg.grid_size)
    return vel + density_drift(counts, types, cfg)
