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


def _advect_condition(types: jnp.ndarray, c: int, x0=0) -> jnp.ndarray:
    """Advection applies to component c of cell i iff i_c != 0 and (cell i is
    WATER or cell i + e_c is WATER — the reference checks the *upper*
    neighbor, `advect.comp:66-71`).  `x0` offsets the x index under sharding
    (the i_x != 0 test is against the GLOBAL coordinate)."""
    water = types == CellType.WATER
    up = tuple(1 if k == c else 0 for k in range(3))
    cond = water | shifted(water, up, fill=False)
    idx = jnp.arange(types.shape[c])
    if c == 0:
        idx = x0 + idx
    nonzero = (idx != 0).reshape(tuple(-1 if k == c else 1 for k in range(3)))
    return cond & nonzero


def advect_gather(types: jnp.ndarray, vel: jnp.ndarray,
                  cfg: FluidConfig) -> jnp.ndarray:
    """Stage 07, reference-shaped path: semi-Lagrangian advection with
    per-point trilinear gathers (`07_advect/advect.comp:52-97`).  Exact but
    gather-bound on TPU; kept as the semantics oracle for `advect`."""
    base = _cell_centers(types.shape, vel.dtype)
    out = []
    for c in range(3):
        cond = _advect_condition(types, c)
        fmove = jnp.array([0.5 if k != c else 0.0 for k in range(3)],
                          dtype=vel.dtype)
        pos = base + fmove                      # face center of component c
        cur_v = velocity_at(vel, pos)
        back = pos - cur_v * cfg.dt
        sampled = velocity_component_at(vel, back, c)
        out.append(jnp.where(cond, sampled, vel[c]))
    return jnp.stack(out)


def face_center_velocity(vel: jnp.ndarray, c: int) -> jnp.ndarray:
    """Full velocity vector sampled at every face center of component c —
    the first sample of `advect.comp:74-78`, which is grid-aligned and
    therefore reduces to exact structured averages (no gather):

      component c     -> the stored value itself,
      component c'!=c -> 4-point average over {i_c-1, i_c} x {i_c', i_c'+1}
                         with clamp-to-edge at the borders.
    """
    from tpu_fluid.ops.packed_sampler import _edge_shift
    comps = []
    for cp in range(3):
        if cp == c:
            comps.append(vel[c])
            continue
        acc = jnp.zeros_like(vel[cp])
        for dc in (-1, 0):
            for dcp in (0, 1):
                off = [0, 0, 0]
                off[c] = dc
                off[cp] = dcp
                acc = acc + _edge_shift(vel[cp], tuple(off))
        comps.append(0.25 * acc)
    return jnp.stack(comps)


def advect(types: jnp.ndarray, vel: jnp.ndarray,
           cfg: FluidConfig) -> jnp.ndarray:
    """Stage 07 dispatcher: picks the Pallas kernel per cfg.pallas_mode
    ("auto" = on TPU), the XLA shift-select path elsewhere, or whatever
    cfg.advect_method pins."""
    from tpu_fluid.kernels import pallas_choice
    method = cfg.advect_method
    use_pallas, interpret = pallas_choice(cfg)
    if method == "auto":
        method = "pallas" if use_pallas else "shift"
    if method == "gather":
        return advect_gather(types, vel, cfg)
    if method == "pallas":
        return advect_pallas(types, vel, cfg, interpret=interpret)
    return advect_shift(types, vel, cfg)


def advect_pallas(types: jnp.ndarray, vel: jnp.ndarray,
                  cfg: FluidConfig, interpret: bool = False) -> jnp.ndarray:
    """Stage 07 via the fused Pallas slab kernel (kernels/advect.py, all 3
    components + in-register face-center velocities); same semantics as
    advect_shift."""
    from tpu_fluid.kernels.advect import (advect_all_pallas,
                                          advect_component_pallas,
                                          advect_one_pallas)
    r = cfg.advect_max_displacement
    _, gx, gy, gz = vel.shape
    if gy * gz <= 128 * 128:
        cond3 = jnp.stack([_advect_condition(types, c) for c in range(3)]
                          ).astype(jnp.uint8)
        return advect_all_pallas(vel, cond3, r, cfg.dt, interpret=interpret)
    if not interpret and (gy + 2 * r) * gz > 289 * 288:
        # giant y*z planes: even the minimum tx=r slab structurally
        # overflows scoped VMEM — the per-component kernel's MAC tree
        # keeps ~34 (tx+2r, gy+2r, gz) f32 temporaries live, measured
        # 120.6 M vs the 100 M budget at 384^2 (round-5, the 384^3 scale
        # probe).  The XLA shift path is semantics-pinned identical
        # (tests/test_fast_paths.py) and VMEM-safe at any plane size.
        return advect_shift(types, vel, cfg)
    # large y*z planes: the fused kernel's unrolled MAC tree spills VMEM;
    # run one component per kernel (1/3 of the live set) instead.
    # advect_one_pallas keeps the face-center velocity in-register and
    # reads vel halos directly (no u fields or 3x views through HBM);
    # grids without an r|tx|gx slab factorization take the older
    # materialized-u component kernel.
    out = []
    for c in range(3):
        cond = _advect_condition(types, c)
        try:
            out.append(advect_one_pallas(vel, cond, c, r, cfg.dt,
                                         interpret=interpret))
        except ValueError:
            u = -face_center_velocity(vel, c) * cfg.dt
            out.append(advect_component_pallas(vel[c], u, cond, r, tx=2,
                                               interpret=interpret))
    return jnp.stack(out)


def advect_shift(types: jnp.ndarray, vel: jnp.ndarray,
                 cfg: FluidConfig, x0=0, gx_total=None) -> jnp.ndarray:
    """Stage 07, XLA shift-select path: gather-free semi-Lagrangian
    advection.

    The backtraced sample point for component c at cell i is exactly
    t = i - v_face * dt in texel space (face-center offset and stagger shift
    cancel), so the displacement u = -v_face*dt is bounded by the CFL number.
    Instead of a random gather we evaluate the trilinear interpolation as a
    masked sum over all integer offsets |delta| <= R of edge-replicated
    shifted copies of the field — pure VPU work that XLA tile-fuses, and that
    shards cleanly (halo width R).

    R = cfg.advect_max_displacement cells; displacements are clamped to
    [-R, R] (the only deviation from the reference, and only for cells moving
    faster than R cells/step; R=2 covers |v| <= 200 at dt=0.01).

    Sharded use (inside shard_map): pass the halo-extended local block with
    `x0` = global x index of its first row and `gx_total` = full domain x
    size, then slice off the halo rows of the result — the coordinate clamp
    and the i_x != 0 condition are against GLOBAL coordinates.
    """
    r = cfg.advect_max_displacement
    shape = types.shape
    out = []
    for c in range(3):
        cond = _advect_condition(types, c, x0=x0)
        u = -face_center_velocity(vel, c) * cfg.dt        # (3, X, Y, Z)
        u = jnp.clip(u, -r, r - 1e-4)
        # clamp-to-edge: clip the absolute texel coordinate to [0, N-1]
        axes = []
        for d in range(3):
            n = (gx_total or shape[0]) if d == 0 else shape[d]
            i_d = jnp.arange(shape[d], dtype=vel.dtype).reshape(
                tuple(-1 if k == d else 1 for k in range(3)))
            if d == 0:
                i_d = i_d + x0
            t_d = jnp.clip(i_d + u[d], 0.0, n - 1.0)
            u_d = t_d - i_d
            o_d = jnp.floor(u_d)
            f_d = u_d - o_d
            # per-offset hat weights: w[delta] = (o==delta)(1-f) + (o==delta-1)f
            w = [(o_d == delta) * (1.0 - f_d) + (o_d == delta - 1) * f_d
                 for delta in range(-r, r + 1)]
            axes.append(w)
        wx, wy, wz = axes
        # pad once (edge mode = clamp-to-edge), then every shifted copy is a
        # plain slice of the padded array
        padded = jnp.pad(vel[c], r, mode="edge")
        gx, gy, gz = shape

        acc = jnp.zeros_like(vel[c])
        for ax, dxo in enumerate(range(-r, r + 1)):
            for ay, dyo in enumerate(range(-r, r + 1)):
                wxy = wx[ax] * wy[ay]
                for az, dzo in enumerate(range(-r, r + 1)):
                    sl = padded[r + dxo:r + dxo + gx,
                                r + dyo:r + dyo + gy,
                                r + dzo:r + dzo + gz]
                    acc = acc + (wxy * wz[az]) * sl
        out.append(jnp.where(cond, acc, vel[c]))
    return jnp.stack(out)


def apply_forces(types: jnp.ndarray, vel: jnp.ndarray,
                 cfg: FluidConfig, force_field=None) -> jnp.ndarray:
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
    out = vel.at[1].add(cfg.dt * force)

    # configurable extra cell forces (generalized fountains): component c
    # applies where the face is wet, i.e. cell or lower-c neighbor is WATER
    for (cx, cy, cz), fvec in cfg.extra_forces:
        cell = jnp.zeros(types.shape, dtype=bool).at[cx, cy, cz].set(True)
        for c in range(3):
            if fvec[c] == 0.0:
                continue
            mv = tuple(-1 if k == c else 0 for k in range(3))
            wet_c = water | shifted(water, mv, fill=False)
            out = out.at[c].add(
                jnp.where(cell & wet_c, cfg.dt * fvec[c], 0.0
                          ).astype(vel.dtype))

    if force_field is not None:
        # dynamic per-cell force field (core/scene_fields.SceneFields.force)
        # — the reference's future-work "force vector texture"; component c
        # lands on the cell's face c under the same wetness rule as gravity
        for c in range(3):
            mv = tuple(-1 if k == c else 0 for k in range(3))
            wet_c = water | shifted(water, mv, fill=False)
            out = out.at[c].add(
                jnp.where(wet_c, cfg.dt * force_field[c], 0.0
                          ).astype(vel.dtype))
    return out


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
