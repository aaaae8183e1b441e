"""Pallas (Mosaic) kernels: fused sim-grid stage groups.

Three kernels replace ~10 XLA stencil passes over the (X, Y, Z) sim grid
(each materializing its output to HBM) with one HBM read/write per group:

  classify_extrap_pallas   stages 02-06  (water/air/solid typing + velocity
                           extrapolation state machine)
  forces_solids_div_pallas stages 08-11  (gravity/fountain forces, solid
                           repel clamps, divergence; 09 diffuse is the
                           reference's no-op)
  project_pallas           stage 13      (pressure-gradient subtraction)

Reference semantics reproduced exactly (pinned by tests vs the jnp stages,
which golden tests pin to the shaders): `02_update_water/update_water.comp`,
`03_update_air/update_active.comp`, `04/05_extrapolate_*`, `06_update_cell_
types`, `08_forces/forces.comp`, `10_solids/solids.comp`, `11_compute_
divergence`, `13_fix_divergence/fix_divergence.comp`.

Mosaic notes (learned in kernels/surface_fused.py): scalar-branch
`jnp.where` on comparison masks can hit invalid i1 relayouts on wide slabs,
so every select here is an arithmetic 0/1-indicator form (`_eqi`) or a
min/max clamp — both bitwise-identical to the jnp selects for the values
this pipeline produces.  The x halo follows kernels/jacobi.py (prev/cur/next
block views of x-padded inputs); `x0_ref` carries the shard's global x
offset so border/fountain coordinates and the out-of-domain INACTIVE rule
apply at true domain positions under shard_map.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_fluid.kernels.halo import clamped_halo_maps
from tpu_fluid.kernels.jacobi import _zshift

_W = 2   # CellType.WATER
_A = 1   # CellType.AIR
_S = 3   # CellType.SOLID


def _eqi(a, v):
    """0/1 int indicator of a == v (a >= 0 int vector, v const)."""
    return 1 - jnp.minimum(jnp.abs(a - v), 1)


def _ori(*xs):
    s = xs[0]
    for x in xs[1:]:
        s = s + x
    return jnp.minimum(s, 1)


def _shift6(a, nrows, gy, gz):
    """6-neighborhood shifts in ops/stencil.MOVES order (+x,+y,+z,-x,-y,-z)
    so accumulation order — and therefore float rounding — matches the jnp
    stages bitwise."""
    return [_zshift(a, 1, 0, nrows), _zshift(a, 1, 1, gy),
            _zshift(a, 1, 2, gz), _zshift(a, -1, 0, nrows),
            _zshift(a, -1, 1, gy), _zshift(a, -1, 2, gz)]


def _lower_shift(a, c, nrows, gy, gz):
    """value of a at i - e_c (zero OOB)."""
    size = (nrows, gy, gz)[c]
    return _zshift(a, -1, c, size)


def _upper_shift(a, c, nrows, gy, gz):
    size = (nrows, gy, gz)[c]
    return _zshift(a, 1, c, size)


def _axis_eq(v, axis, shape3, dtype=jnp.int32):
    """(…,1,…) iota==v indicator along axis, for broadcasting masks."""
    n = shape3[axis]
    bshape = tuple(n if k == axis else 1 for k in range(3))
    idx = jax.lax.broadcasted_iota(jnp.int32, bshape, axis)
    return _eqi(idx, v).astype(dtype)


def _solid_indicator(x, gy, gz, global_shape, solid_boxes):
    """(rows,1,1)+(1,gy,1)+(1,1,gz) arithmetic border/obstacle indicator;
    x is the (rows,1,1) GLOBAL x coordinate (may be negative in halos)."""
    gx = global_shape[0]
    iy = jax.lax.broadcasted_iota(jnp.int32, (1, gy, 1), 1)
    iz = jax.lax.broadcasted_iota(jnp.int32, (1, 1, gz), 2)
    xb = _ori(_eqi(x, 0), _eqi(x, gx - 1))
    yb = _ori(_eqi(iy, 0), _eqi(iy, gy - 1))
    zb = _ori(_eqi(iz, 0), _eqi(iz, gz - 1))
    s = _ori(_ori(xb + jnp.zeros((1, gy, 1), jnp.int32), yb), zb)

    def _ge(a, v):           # a >= v indicator (ints)
        return jnp.clip(a - (v - 1), 0, 1)

    def _lt(a, v):
        return 1 - _ge(a, v)

    for (bx0, by0, bz0), (bx1, by1, bz1) in solid_boxes:
        inside = (_ge(x, bx0) * _lt(x, bx1)
                  * (_ge(iy, by0) * _lt(iy, by1))
                  * (_ge(iz, bz0) * _lt(iz, bz1)))
        s = _ori(s, inside)
    return s                 # (rows, gy, gz) via broadcasting



def _make_asm(tx, h, gy, gz, dummy):
    """Slab assembler shared by the three kernels: prev/cur/next block views
    -> one (tx + 2h [+dummy], ...) slab, with 8-alignment dummy zero rows
    beyond the halo (never reaching output rows)."""
    def asm(prev, cur, nxt, vdim=False):
        parts = [prev[..., tx - h:, :, :], cur[...], nxt[..., :h, :, :]]
        if dummy:
            zshape = ((3, dummy, gy, gz) if vdim else (dummy, gy, gz))
            parts.append(jnp.zeros(zshape, dtype=cur.dtype))
        return jnp.concatenate(parts, axis=1 if vdim else 0)
    return asm


def _make_asm_direct(i, nb, gy, gz, dummy):
    """Direct-halo slab assembler (the kernels/jacobi.py:97-116 technique):
    the h-row halos arrive as SEPARATE blocks read straight out of the
    UNPADDED field arrays via clamped h-row-unit index maps — no x-pad
    copies, no lost XLA consumer fusion on the inputs.  Domain-end programs
    read a clamped (garbage) block; mask it to the zero-pad convention."""
    def asm(l, cur, r, vdim=False):
        lv = jnp.where(i == 0, jnp.zeros_like(l[...]), l[...])
        rv = jnp.where(i == nb - 1, jnp.zeros_like(r[...]), r[...])
        parts = [lv, cur[...], rv]
        if dummy:
            zshape = ((3, dummy, gy, gz) if vdim else (dummy, gy, gz))
            parts.append(jnp.zeros(zshape, dtype=cur.dtype))
        return jnp.concatenate(parts, axis=1 if vdim else 0)
    return asm


# ------------------------------------------------------------- stages 02-06
def _classify_extrap_kernel(x0_ref, occ_p, occ_c, occ_n, ot_p, ot_c, ot_n,
                            v_p, v_c, v_n, types_out, vel_out, *,
                            h, tx, shape, solid_boxes, nb=None):
    gx, gy, gz = shape
    x0 = x0_ref[0]
    i = pl.program_id(0)
    nrows = -(-(tx + 2 * h) // 8) * 8
    dummy = nrows - (tx + 2 * h)

    asm = (_make_asm_direct(i, nb, gy, gz, dummy) if nb
           else _make_asm(tx, h, gy, gz, dummy))

    occ = asm(occ_p, occ_c, occ_n).astype(jnp.int32)
    oldt = asm(ot_p, ot_c, ot_n).astype(jnp.int32)
    vel = asm(v_p, v_c, v_n, vdim=True)

    x = (x0 + i * tx - h
         + jax.lax.broadcasted_iota(jnp.int32, (nrows, 1, 1), 0))
    idom = (jnp.clip(x + 1, 0, 1)
            * jnp.clip(gx - x, 0, 1))            # 0 <= x < gx

    # 02 (update_water.comp:23-34): occupied -> WATER, else INACTIVE
    new_w = jnp.minimum(occ, 1)

    # 03 (update_active.comp:45-66): non-water with a WATER 6-neighbor ->
    # AIR; border/obstacles -> SOLID.  Out-of-domain rows are INACTIVE.
    aro = _ori(*_shift6(new_w, nrows, gy, gz))
    air = (1 - new_w) * aro
    s = _solid_indicator(x, gy, gz, shape, solid_boxes)
    newt = (_W * new_w + _A * air) * (1 - s) + _S * s
    newt = newt * idom

    # 04 (extrapolated_velocities.comp:37-63): per cell the mean velocity of
    # its <= 6 WATER neighbors under the OLD types (zero if none)
    old_w = _eqi(oldt, _W).astype(vel.dtype)
    count = jnp.zeros((nrows, gy, gz), vel.dtype)
    for sh in _shift6(old_w, nrows, gy, gz):
        count = count + sh
    denom = jnp.maximum(count, 1.0)
    extr = []
    for c in range(3):
        vw = vel[c] * old_w
        vsum = jnp.zeros((nrows, gy, gz), vel.dtype)
        for sh in _shift6(vw, nrows, gy, gz):
            vsum = vsum + sh
        extr.append(vsum / denom)   # exact 0 where count == 0 (vsum == 0)

    # 05 (extrapolate_velocities.comp:43-109): face active iff either
    # adjacent cell is WATER or AIR; was/is state machine per component
    was = _ori(_eqi(oldt, _W), _eqi(oldt, _A)).astype(vel.dtype)
    is_ = _ori(_eqi(newt, _W), _eqi(newt, _A)).astype(vel.dtype)
    comps = []
    for c in range(3):
        was_c = jnp.minimum(was + _lower_shift(was, c, nrows, gy, gz), 1.0)
        is_c = jnp.minimum(is_ + _lower_shift(is_, c, nrows, gy, gz), 1.0)
        gone = was_c * (1.0 - is_c)     # was & ~is  -> 0
        born = (1.0 - was_c) * is_c     # ~was & is  -> extrapolated
        comp = (1.0 - gone) * (born * extr[c] + (1.0 - born) * vel[c])
        comps.append(comp[h:h + tx])

    # 06: commit
    types_out[...] = newt[h:h + tx].astype(jnp.uint8)
    vel_out[...] = jnp.stack(comps, axis=0)


# ------------------------------------------------------------- stages 08-11
def _forces_solids_div_kernel(x0_ref, t_p, t_c, t_n, v_p, v_c, v_n,
                              vel_out, div_out, *,
                              h, tx, shape, dt, gravity, fountain,
                              fountain_force, extra_forces, repel, nb=None):
    gx, gy, gz = shape
    x0 = x0_ref[0]
    i = pl.program_id(0)
    nrows = -(-(tx + 2 * h) // 8) * 8
    dummy = nrows - (tx + 2 * h)

    asm = (_make_asm_direct(i, nb, gy, gz, dummy) if nb
           else _make_asm(tx, h, gy, gz, dummy))

    t = asm(t_p, t_c, t_n).astype(jnp.int32)
    vel = asm(v_p, v_c, v_n, vdim=True)
    x = (x0 + i * tx - h
         + jax.lax.broadcasted_iota(jnp.int32, (nrows, 1, 1), 0))

    def cell_ind(cx, cy, cz, dtype):
        return (_eqi(x, cx).astype(dtype)
                * _axis_eq(cy, 1, (nrows, gy, gz), dtype)
                * _axis_eq(cz, 2, (nrows, gy, gz), dtype))

    # 08 (forces.comp:33-55): gravity + fountain on wet y-faces (y != 0)
    water = _eqi(t, _W).astype(vel.dtype)
    wet_y = jnp.minimum(water + _lower_shift(water, 1, nrows, gy, gz), 1.0)
    ynz = 1.0 - _axis_eq(0, 1, (nrows, gy, gz), vel.dtype)
    force = wet_y * ynz * gravity
    fx, fy, fz = fountain
    force = force + cell_ind(fx, fy, fz, vel.dtype) * wet_y * fountain_force
    v0, v1, v2 = vel[0], vel[1] + dt * force, vel[2]

    # extra cell forces (generalized fountains), static unroll
    vs = [v0, v1, v2]
    for (cx, cy, cz), fvec in extra_forces:
        cell = cell_ind(cx, cy, cz, vel.dtype)
        for c in range(3):
            if fvec[c] == 0.0:
                continue
            wet_c = jnp.minimum(
                water + _lower_shift(water, c, nrows, gy, gz), 1.0)
            vs[c] = vs[c] + cell * wet_c * (dt * fvec[c])

    # 10 (solids.comp:30-77): min/max clamp forms of the repel rules
    solid = _eqi(t, _S).astype(vel.dtype)
    for c in range(3):
        v = vs[c]
        v = solid * jnp.minimum(v, -repel) + (1.0 - solid) * v
        ls = _lower_shift(solid, c, nrows, gy, gz)
        v = ls * jnp.maximum(v, repel) + (1.0 - ls) * v
        vs[c] = v

    # 11 (compute_divergence.comp:18-29) on the post-solids field.  Rows
    # beyond the global domain computed a spurious stage-10 repel (their
    # lower-x neighbor is the SOLID border) — the GLSL robust read is 0, so
    # zero them before they feed the last row's divergence.
    idom = (jnp.clip(x + 1, 0, 1) * jnp.clip(gx - x, 0, 1)
            ).astype(vel.dtype)
    vs = [v * idom for v in vs]
    div = jnp.zeros((nrows, gy, gz), vel.dtype)
    for c in range(3):
        div = div + _upper_shift(vs[c], c, nrows, gy, gz) - vs[c]

    vel_out[...] = jnp.stack([v[h:h + tx] for v in vs], axis=0)
    div_out[...] = div[h:h + tx]


# --------------------------------------------------------------- stage 13
def _project_kernel(x0_ref, t_p, t_c, t_n, p_p, p_c, p_n, v_p, v_c, v_n,
                    vel_out, *, h, tx, shape, scale, nb=None):
    gx, gy, gz = shape
    x0 = x0_ref[0]
    i = pl.program_id(0)
    nrows = -(-(tx + 2 * h) // 8) * 8
    dummy = nrows - (tx + 2 * h)

    asm = (_make_asm_direct(i, nb, gy, gz, dummy) if nb
           else _make_asm(tx, h, gy, gz, dummy))

    t = asm(t_p, t_c, t_n).astype(jnp.int32)
    p = asm(p_p, p_c, p_n)
    vel = asm(v_p, v_c, v_n, vdim=True)
    x = (x0 + i * tx - h
         + jax.lax.broadcasted_iota(jnp.int32, (nrows, 1, 1), 0))

    water = _eqi(t, _W)
    solid = _eqi(t, _S)
    comps = []
    for c in range(3):
        lo_w = _lower_shift(water, c, nrows, gy, gz)
        lo_s = _lower_shift(solid, c, nrows, gy, gz)
        if c == 0:
            nonzero = 1 - _eqi(x, 0)
        else:
            nonzero = 1 - _axis_eq(0, c, (nrows, gy, gz))
        cond = (nonzero * _ori(water, lo_w)
                * (1 - solid) * (1 - lo_s)).astype(vel.dtype)
        grad = p - _lower_shift(p, c, nrows, gy, gz)
        comps.append((vel[c] - scale * (cond * grad))[h:h + tx])
    vel_out[...] = jnp.stack(comps, axis=0)


# --------------------------------------------------------------- wrappers
def _slab_tx(gx, gy, gz, h, tx):
    """Slab rows per program; falls back to the smallest divisor of gx >= h
    when nothing in [h, tx] divides (e.g. a prime gx or SPMD local extent)."""
    tx = max(h, min(tx, max(h, 262144 // (gy * gz))))
    if gx % tx != 0:
        tx = next((t for t in range(min(tx, gx), h - 1, -1)
                   if gx % t == 0), None)
        if tx is None:
            tx = next(t for t in range(h, gx + 1) if gx % t == 0)
    return tx


def _xpad(a, tx, h, halo):
    """x-pad by a full block on each side: zeros single-device, or the
    (left, right) h-wide neighbor planes nearest the block under shard_map.
    Works on (X, Y, Z) and (C, X, Y, Z)."""
    ax = a.ndim - 3
    if halo is None:
        pads = [(0, 0)] * a.ndim
        pads[ax] = (tx, tx)
        return jnp.pad(a, pads)
    left, right = halo
    zshape = list(a.shape)
    zshape[ax] = tx - h
    z = jnp.zeros(zshape, dtype=a.dtype)
    return jnp.concatenate([z, left, a, right, z], axis=ax)


def _call(kern, inputs, out_shapes, tx, gy, gz, gx, interpret, h=None):
    """Shared pallas_call builder.  With `h` (direct mode, requires h | tx
    and UNPADDED inputs): x0 in SMEM + per array (left-halo, current,
    right-halo) blocks, the h-row halos read straight from the field via
    clamped h-row-unit index maps (kernels/jacobi.py:217-238 technique).
    Without `h`: x0 + prev/cur/next slabs of each x-PADDED input."""
    x0a, arrays = inputs[0], inputs[1:]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    ops = [x0a]
    if h is not None:
        nb = gx // tx
        # index maps count in h-row units
        lo, hi = clamped_halo_maps(tx // h, nb * (tx // h) - 1)
        for a in arrays:
            if a.ndim == 4:
                cur = pl.BlockSpec((3, tx, gy, gz), lambda i: (0, i, 0, 0),
                                   memory_space=pltpu.VMEM)
                lsp = pl.BlockSpec((3, h, gy, gz),
                                   lambda i: (0, lo(i), 0, 0),
                                   memory_space=pltpu.VMEM)
                rsp = pl.BlockSpec((3, h, gy, gz),
                                   lambda i: (0, hi(i), 0, 0),
                                   memory_space=pltpu.VMEM)
            else:
                cur = pl.BlockSpec((tx, gy, gz), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)
                lsp = pl.BlockSpec((h, gy, gz), lambda i: (lo(i), 0, 0),
                                   memory_space=pltpu.VMEM)
                rsp = pl.BlockSpec((h, gy, gz), lambda i: (hi(i), 0, 0),
                                   memory_space=pltpu.VMEM)
            # order (l, cur, r): the kernels' (a_p, a_c, a_n) slots become
            # (left halo, current, right halo) — asm's middle is cur in
            # both modes
            in_specs += [lsp, cur, rsp]
            ops += [a, a, a]
    else:
        for a in arrays:
            if a.ndim == 4:
                spec = lambda off: pl.BlockSpec(        # noqa: E731
                    (3, tx, gy, gz), lambda i, o=off: (0, i + o, 0, 0),
                    memory_space=pltpu.VMEM)
            else:
                spec = lambda off: pl.BlockSpec(        # noqa: E731
                    (tx, gy, gz), lambda i, o=off: (i + o, 0, 0),
                    memory_space=pltpu.VMEM)
            in_specs += [spec(0), spec(1), spec(2)]
            ops += [a, a, a]
    out_specs, shapes = [], []
    for shp, dt in out_shapes:
        if len(shp) == 4:
            out_specs.append(pl.BlockSpec(
                (3, tx, gy, gz), lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM))
        else:
            out_specs.append(pl.BlockSpec(
                (tx, gy, gz), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM))
        shapes.append(jax.ShapeDtypeStruct(shp, dt))
    single = len(out_shapes) == 1
    return pl.pallas_call(
        kern,
        grid=(gx // tx,),
        in_specs=in_specs,
        out_specs=out_specs[0] if single else tuple(out_specs),
        out_shape=shapes[0] if single else tuple(shapes),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*ops)


def classify_extrap_pallas(occ_sim, old_types, vel, cfg, *,
                           tx: int = 16, halos=None, x0=None,
                           global_gx=None, interpret=False):
    """Stages 02-06 fused: (occ_sim, old_types, vel) -> (types, vel').
    h = 2 (the stage-05 state machine reads stage-03 types of x+-1 cells,
    whose air test reads water at x+-2).  `halos`: ((l, r), ...) 2-wide
    planes for (occ_sim, old_types, vel) under shard_map."""
    gx, gy, gz = occ_sim.shape
    h = 2
    tx = _slab_tx(gx, gy, gz, h, tx)
    halos = halos or (None,) * 3
    x0a = jnp.zeros((1,), jnp.int32) if x0 is None else \
        jnp.asarray(x0, jnp.int32).reshape(1)
    direct = all(hl is None for hl in halos) and tx % h == 0
    kern = functools.partial(
        _classify_extrap_kernel, h=h, tx=tx,
        shape=(global_gx or gx, gy, gz), solid_boxes=tuple(cfg.solid_boxes),
        nb=(gx // tx) if direct else None)
    if direct:
        return _call(kern, (x0a, occ_sim, old_types, vel),
                     (((gx, gy, gz), jnp.uint8),
                      ((3, gx, gy, gz), vel.dtype)),
                     tx, gy, gz, gx, interpret, h=h)
    return _call(kern,
                 (x0a, _xpad(occ_sim, tx, h, halos[0]),
                  _xpad(old_types, tx, h, halos[1]),
                  _xpad(vel, tx, h, halos[2])),
                 (((gx, gy, gz), jnp.uint8),
                  ((3, gx, gy, gz), vel.dtype)),
                 tx, gy, gz, gx, interpret)


def forces_solids_div_pallas(types, vel, cfg, *, tx: int = 16, halos=None,
                             x0=None, global_gx=None, interpret=False):
    """Stages 08-11 fused (09 is the reference's no-op; configs with real
    diffusion fall back to the jnp stages): (types, vel) -> (vel', div)."""
    gx, gy, gz = types.shape
    h = 1
    tx = _slab_tx(gx, gy, gz, h, tx)
    halos = halos or (None,) * 2
    x0a = jnp.zeros((1,), jnp.int32) if x0 is None else \
        jnp.asarray(x0, jnp.int32).reshape(1)
    direct = all(hl is None for hl in halos)
    kern = functools.partial(
        _forces_solids_div_kernel, h=h, tx=tx,
        shape=(global_gx or gx, gy, gz), dt=cfg.dt, gravity=cfg.gravity,
        fountain=tuple(cfg.fountain), fountain_force=cfg.fountain_force,
        extra_forces=tuple(cfg.extra_forces),
        repel=cfg.solid_repel_velocity,
        nb=(gx // tx) if direct else None)
    if direct:
        return _call(kern, (x0a, types, vel),
                     (((3, gx, gy, gz), vel.dtype),
                      ((gx, gy, gz), vel.dtype)),
                     tx, gy, gz, gx, interpret, h=h)
    return _call(kern,
                 (x0a, _xpad(types, tx, h, halos[0]),
                  _xpad(vel, tx, h, halos[1])),
                 (((3, gx, gy, gz), vel.dtype), ((gx, gy, gz), vel.dtype)),
                 tx, gy, gz, gx, interpret)


def project_pallas(types, p, vel, cfg, *, tx: int = 16, halos=None,
                   x0=None, global_gx=None, interpret=False):
    """Stage 13 fused: (types, p, vel) -> vel'."""
    gx, gy, gz = types.shape
    h = 1
    tx = _slab_tx(gx, gy, gz, h, tx)
    halos = halos or (None,) * 3
    x0a = jnp.zeros((1,), jnp.int32) if x0 is None else \
        jnp.asarray(x0, jnp.int32).reshape(1)
    scale = cfg.dt / (cfg.fluid_density * cfg.cell_width)
    direct = all(hl is None for hl in halos)
    kern = functools.partial(_project_kernel, h=h, tx=tx,
                             shape=(global_gx or gx, gy, gz), scale=scale,
                             nb=(gx // tx) if direct else None)
    if direct:
        return _call(kern, (x0a, types, p, vel),
                     (((3, gx, gy, gz), vel.dtype),),
                     tx, gy, gz, gx, interpret, h=h)
    return _call(kern,
                 (x0a, _xpad(types, tx, h, halos[0]),
                  _xpad(p, tx, h, halos[1]), _xpad(vel, tx, h, halos[2])),
                 (((3, gx, gy, gz), vel.dtype),),
                 tx, gy, gz, gx, interpret)
