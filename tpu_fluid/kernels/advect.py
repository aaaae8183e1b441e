"""Pallas (Mosaic) kernel for the shift-select semi-Lagrangian advection.

The XLA formulation of the same math (stages/velocity.advect_shift) is
correct but fuses poorly: the (2R+1)^3 shifted multiply-accumulates re-read
the field from HBM (~16 GB accessed per step at 128^3).  This kernel blocks
the field into x-slabs held in VMEM and runs the whole (2R+1)^3-term MAC on
the VPU — HBM traffic drops to ~3 reads + 1 write of the component.

Blocking: 1-D grid over x-slabs of size TX.  The x-halo (R cells) is
obtained by passing the x-edge-padded field three times with block index
maps i, i+1, i+2 (prev/cur/next slabs) — Mosaic cannot DMA lane-unaligned
HBM slices, so overlapping halo DMAs are expressed through the automatic
block pipeline instead.  y/z halos are edge-replicated in-register.

Per program:
  1. assemble the (TX+2R, Y+2R, Z) slab from prev/cur/next + y edge pad;
  2. pre-shift z into 2R+1 edge-clamped variants (lane rolls done once);
  3. o = floor(u'), f = frac(u') with clamp-to-edge coordinate clipping;
  4. acc = sum over delta of prod_d[(o_d==delta_d)(1-f_d)+(o_d==delta_d-1)f_d]
     * slab[delta + cell];
  5. out = where(cond, acc, old).

Semantics identical to stages/velocity.advect_shift, which is pinned to the
reference's `07_advect/advect.comp:52-97` by golden tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _advect_component_kernel(x0_ref, prev_ref, cur_ref, next_ref, u_ref,
                             cond_ref, old_ref, out_ref, *, r, tx, shape):
    # `shape` is the GLOBAL domain (for coordinate clamping); under sharding
    # x0_ref holds this shard's global x offset and the block geometry is
    # local.  Single-device: x0 = 0 and local == global.
    gx, gy, gz = shape
    i = pl.program_id(0)
    x0 = x0_ref[0]

    # --- assemble x-halo slab (TX+2R, Y, Z) ------------------------------
    a = jnp.concatenate(
        [prev_ref[tx - r:], cur_ref[...], next_ref[:r]], axis=0)
    # --- y edge pad -> (TX+2R, Y+2R, Z) ----------------------------------
    a = jnp.concatenate(
        [jnp.repeat(a[:, :1], r, axis=1), a,
         jnp.repeat(a[:, -1:], r, axis=1)], axis=1)
    # --- pre-shifted z variants (edge clamp), one lane-roll each ---------
    zv = []
    for dz in range(-r, r + 1):
        if dz < 0:
            zv.append(jnp.concatenate(
                [jnp.repeat(a[..., :1], -dz, axis=-1), a[..., :gz + dz]],
                axis=-1))
        elif dz > 0:
            zv.append(jnp.concatenate(
                [a[..., dz:], jnp.repeat(a[..., -1:], dz, axis=-1)],
                axis=-1))
        else:
            zv.append(a)

    # --- displacement offsets + per-axis hat weights ---------------------
    x = (x0 + i * tx + jax.lax.broadcasted_iota(jnp.int32, (tx, gy, gz), 0)
         ).astype(jnp.float32)
    y = jax.lax.broadcasted_iota(jnp.int32, (tx, gy, gz), 1).astype(
        jnp.float32)
    z = jax.lax.broadcasted_iota(jnp.int32, (tx, gy, gz), 2).astype(
        jnp.float32)
    coords = (x, y, z)
    dims = (gx, gy, gz)

    os_, fs = [], []
    for d in range(3):
        u_d = jnp.clip(u_ref[d], -r, r - 1e-4)
        t_d = jnp.clip(coords[d] + u_d, 0.0, dims[d] - 1.0)
        u_d = t_d - coords[d]
        o_d = jnp.floor(u_d)
        os_.append(o_d)
        fs.append(u_d - o_d)

    def w(d, delta):
        # lazy hat weight: recomputed per term to keep VMEM pressure low
        # (VPU compares are cheap; materializing all 3*(2R+1) weight arrays
        # blows the scoped-VMEM budget at 128^3)
        return ((os_[d] == delta) * (1.0 - fs[d])
                + (os_[d] == delta - 1) * fs[d])

    acc = jnp.zeros((tx, gy, gz), dtype=out_ref.dtype)
    for dx in range(-r, r + 1):
        for dy in range(-r, r + 1):
            wxy = w(0, dx) * w(1, dy)
            for az, dz in enumerate(range(-r, r + 1)):
                sl = zv[az][r + dx:r + dx + tx, r + dy:r + dy + gy, :]
                acc = acc + (wxy * w(2, dz)) * sl

    out_ref[...] = jnp.where(cond_ref[...] != 0, acc, old_ref[...])


def _advect_comps(a, x0, i, comps, *, r, tx, shape, dt, out_dtype):
    """Shared advection body on an assembled slab `a` (3, TX+2R, Y+2R, Z):
    returns [(advected, passthrough)] for each requested component.  The
    face-center velocity (the first, grid-aligned sample of
    `advect.comp:74-78`) is computed in-register — no displacement fields
    ever touch HBM."""
    gx, gy, gz = shape
    # z handled by materialized pre-shifted variants (concat forces one
    # lane-roll each; repeated lane-offset slices of a padded array would
    # relayout on every one of the 375 MAC terms)
    zvs = []
    for c in range(3):
        ac = a[c]                                  # (TX+2R, Y+2R, Z)
        row = []
        for dz in range(-r, r + 1):
            if dz < 0:
                row.append(jnp.concatenate(
                    [jnp.repeat(ac[..., :1], -dz, axis=-1),
                     ac[..., :gz + dz]], axis=-1))
            elif dz > 0:
                row.append(jnp.concatenate(
                    [ac[..., dz:], jnp.repeat(ac[..., -1:], dz, axis=-1)],
                    axis=-1))
            else:
                row.append(ac)
        zvs.append(row)

    def sl(c, dx, dy, dz):
        return zvs[c][dz + r][r + dx:r + dx + tx, r + dy:r + dy + gy, :]

    x = (x0 + i * tx + jax.lax.broadcasted_iota(jnp.int32, (tx, gy, gz), 0)
         ).astype(jnp.float32)
    y = jax.lax.broadcasted_iota(jnp.int32, (tx, gy, gz), 1).astype(
        jnp.float32)
    z = jax.lax.broadcasted_iota(jnp.int32, (tx, gy, gz), 2).astype(
        jnp.float32)
    coords = (x, y, z)
    dims = (gx, gy, gz)

    results = []
    for c in comps:
        # face-center velocity of component c's faces: own comp = stored
        # value; others = 4-point average over {i_c-1, i_c} x {i_c', i_c'+1}
        vface = []
        for cp in range(3):
            if cp == c:
                vface.append(sl(c, 0, 0, 0))
                continue
            acc = None
            for dc in (-1, 0):
                for dcp in (0, 1):
                    off = [0, 0, 0]
                    off[c] = dc
                    off[cp] = dcp
                    t = sl(cp, *off)
                    acc = t if acc is None else acc + t
            vface.append(0.25 * acc)

        # displacement, clamped offsets + fractions
        os_, fs = [], []
        for d in range(3):
            u_d = jnp.clip(-vface[d] * dt, -r, r - 1e-4)
            t_d = jnp.clip(coords[d] + u_d, 0.0, dims[d] - 1.0)
            u_d = t_d - coords[d]
            o_d = jnp.floor(u_d)
            os_.append(o_d)
            fs.append(u_d - o_d)

        def w(d, delta):
            return ((os_[d] == delta) * (1.0 - fs[d])
                    + (os_[d] == delta - 1) * fs[d])

        acc = jnp.zeros((tx, gy, gz), dtype=out_dtype)
        for dx in range(-r, r + 1):
            for dy in range(-r, r + 1):
                wxy = w(0, dx) * w(1, dy)
                for dz in range(-r, r + 1):
                    acc = acc + (wxy * w(2, dz)) * sl(c, dx, dy, dz)
        results.append((acc, sl(c, 0, 0, 0)))
    return results


def _advect_all_kernel(x0_ref, prev_ref, cur_ref, next_ref, cond_ref,
                       out_ref, *, r, tx, shape, dt):
    """All 3 staggered components in one program via _advect_comps.
    `shape` is the GLOBAL domain; x0_ref the shard's global x offset
    (0 single-device)."""
    i = pl.program_id(0)
    x0 = x0_ref[0]
    # --- assemble (3, TX+2R, Y+2R, Z) with x halo + y edge pads -----------
    a = jnp.concatenate(
        [prev_ref[:, tx - r:], cur_ref[...], next_ref[:, :r]], axis=1)
    a = jnp.concatenate(
        [jnp.repeat(a[:, :, :1], r, axis=2), a,
         jnp.repeat(a[:, :, -1:], r, axis=2)], axis=2)
    res = _advect_comps(a, x0, i, (0, 1, 2), r=r, tx=tx, shape=shape,
                        dt=dt, out_dtype=out_ref.dtype)
    out_ref[...] = jnp.stack(
        [jnp.where(cond_ref[c] != 0, acc, old)
         for c, (acc, old) in enumerate(res)], axis=0)


def _advect_one_impl(x0_ref, cur_ref, l_ref, r_ref, el, er,
                     cond_ref, out_ref, *, c, r, tx, shape, nb, dt):
    """One staggered component per program, with the vel x-halos read
    DIRECTLY from the field via r-row-unit clamped block index maps (no
    displacement or halo materialization in HBM — the big-plane path that
    replaced the 3x-view + XLA-built-u component kernel).  Domain-end
    programs replace the clamped (garbage) halo block with the edge rule:
    edge-replication of the domain boundary row (el/er None, single
    device) or the ppermuted neighbor planes in el/er (shard_map)."""
    i = pl.program_id(0)
    x0 = x0_ref[0]
    cur = cur_ref[...]
    if el is None:
        el = jnp.concatenate([cur[:, :1]] * r, axis=1)
        er = jnp.concatenate([cur[:, -1:]] * r, axis=1)
    lv = jnp.where(i == 0, el, l_ref[...])
    rv = jnp.where(i == nb - 1, er, r_ref[...])
    a = jnp.concatenate([lv, cur, rv], axis=1)     # (3, TX+2R, Y, Z)
    a = jnp.concatenate(
        [jnp.repeat(a[:, :, :1], r, axis=2), a,
         jnp.repeat(a[:, :, -1:], r, axis=2)], axis=2)
    (acc, old), = _advect_comps(a, x0, i, (c,), r=r, tx=tx, shape=shape,
                                dt=dt, out_dtype=out_ref.dtype)
    out_ref[...] = jnp.where(cond_ref[...] != 0, acc, old)


def _advect_one_kernel_rep(x0_ref, cur_ref, l_ref, r_ref, cond_ref,
                           out_ref, **kw):
    _advect_one_impl(x0_ref, cur_ref, l_ref, r_ref, None, None,
                     cond_ref, out_ref, **kw)


def _advect_one_kernel_halo(x0_ref, cur_ref, l_ref, r_ref, el_ref, er_ref,
                            cond_ref, out_ref, **kw):
    _advect_one_impl(x0_ref, cur_ref, l_ref, r_ref, el_ref[...], er_ref[...],
                     cond_ref, out_ref, **kw)


def advect_one_pallas(vel: jnp.ndarray, cond: jnp.ndarray, c: int, r: int,
                      dt: float, tx: int = 4, halo=None, x0=None,
                      global_shape=None,
                      interpret: bool = False) -> jnp.ndarray:
    """Advect ONE staggered component with in-register face-center
    velocity and direct halo blocks.  vel: (3, X, Y, Z); cond: (X, Y, Z)
    advection mask for component c.  Sharded use: `halo` = (left, right)
    (3, r, Y, Z) neighbor planes, `x0` the shard's global x offset,
    `global_shape` the full domain.  Requires r | tx | gx (the caller
    falls back to advect_component_pallas otherwise)."""
    _, gx, gy, gz = vel.shape
    # the (2R+1)^3 MAC tree over 3 assembled components spills register
    # slots aggressively; tx=2 fits at a 256^2 plane where tx=4 OOMs VMEM
    tx = max(r, min(tx, max(1, 131072 // (gy * gz))))
    tx = next((t for t in range(min(tx, gx), r - 1, -1)
               if gx % t == 0 and t % r == 0), None)
    if tx is None:
        raise ValueError(f"no feasible slab size for gx={gx}, r={r}")
    nb = gx // tx
    t0 = tx // r
    last = gx // r - 1
    x0a = jnp.zeros((1,), jnp.int32) if x0 is None else \
        jnp.asarray(x0, jnp.int32).reshape(1)
    cur = pl.BlockSpec((3, tx, gy, gz), lambda i: (0, i, 0, 0),
                       memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((3, r, gy, gz),
                         lambda i: (0, jnp.maximum(i * t0 - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((3, r, gy, gz),
                         lambda i: (0, jnp.minimum((i + 1) * t0, last), 0, 0),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((tx, gy, gz), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    espec = pl.BlockSpec((3, r, gy, gz), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    kw = dict(c=c, r=r, tx=tx, shape=global_shape or (gx, gy, gz), nb=nb,
              dt=dt)
    common = dict(
        grid=(nb,),
        out_specs=pl.BlockSpec((tx, gy, gz), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gx, gy, gz), vel.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    cond = cond.astype(jnp.uint8)
    if halo is None:
        kern = functools.partial(_advect_one_kernel_rep, **kw)
        return pl.pallas_call(
            kern, in_specs=[smem, cur, lspec, rspec, cspec], **common,
        )(x0a, vel, vel, vel, cond)
    kern = functools.partial(_advect_one_kernel_halo, **kw)
    return pl.pallas_call(
        kern, in_specs=[smem, cur, lspec, rspec, espec, espec, cspec],
        **common,
    )(x0a, vel, vel, vel, halo[0], halo[1], cond)


def _xpad(a, tx, halo, r):
    """Pad axis -3 by tx on each side.  halo=None: edge-replicate (full
    domain — equivalent to zero-fill given the clamp makes out-of-domain
    weights exactly 0, but matches the historical layout).  halo=(l, r):
    r-wide neighbor planes adjacent to the block, zeros beyond (the kernel
    reads only prev[tx-r:] / next[:r] of each pad block)."""
    ax = a.ndim - 3
    if halo is None:
        pads = [(0, 0)] * a.ndim
        pads[ax] = (tx, tx)
        return jnp.pad(a, pads, mode="edge")
    left, right = halo
    zshape = list(a.shape)
    zshape[ax] = tx - r
    z = jnp.zeros(zshape, dtype=a.dtype)
    return jnp.concatenate([z, left, a, right, z], axis=ax)


def advect_all_pallas(vel: jnp.ndarray, cond3: jnp.ndarray, r: int,
                      dt: float, tx: int = 4, halo=None, x0=None,
                      global_shape=None,
                      interpret: bool = False) -> jnp.ndarray:
    """vel: (3, X, Y, Z); cond3: (3, X, Y, Z) uint8 advection masks.
    Returns the fully advected velocity in one kernel.

    Sharded use (inside shard_map): vel/cond3 are local x-slabs, `halo` the
    (left, right) r-wide neighbor planes (3, r, Y, Z), `x0` the shard's
    global x offset (traced scalar), `global_shape` the full domain dims.
    """
    _, gx, gy, gz = vel.shape
    # the unrolled (2R+1)^3 MAC holds O(hundreds) of (tx, Y, Z) temporaries;
    # shrink the slab on large Y*Z planes to stay inside VMEM
    tx = max(r, min(tx, max(1, 131072 // (gy * gz))))
    if gx % tx != 0:
        tx = next(t for t in range(min(tx, gx), 0, -1) if gx % t == 0)
    if tx < r:
        raise ValueError(f"slab size {tx} must be >= halo {r}")
    grid = (gx // tx,)
    vx = _xpad(vel, tx, halo, r)
    x0a = jnp.zeros((1,), jnp.int32) if x0 is None else \
        jnp.asarray(x0, jnp.int32).reshape(1)

    kernel = functools.partial(
        _advect_all_kernel, r=r, tx=tx,
        shape=global_shape or (gx, gy, gz), dt=dt)
    slab = lambda off: pl.BlockSpec(            # noqa: E731
        (3, tx, gy, gz), lambda i, o=off: (0, i + o, 0, 0),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            slab(0), slab(1), slab(2),
            pl.BlockSpec((3, tx, gy, gz), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, tx, gy, gz), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, gx, gy, gz), vel.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x0a, vx, vx, vx, cond3)


def advect_component_pallas(v: jnp.ndarray, u: jnp.ndarray,
                            cond: jnp.ndarray, r: int, tx: int = 4,
                            halo=None, x0=None, global_shape=None,
                            interpret: bool = False) -> jnp.ndarray:
    """v: (X, Y, Z) field (also the passthrough value); u: (3, X, Y, Z)
    displacement; cond: (X, Y, Z) mask.  Returns the advected component.
    Sharded use: see advect_all_pallas (halo planes are (r, Y, Z) here)."""
    gx, gy, gz = v.shape
    if gx % tx != 0:
        tx = next(t for t in range(min(tx, gx), 0, -1) if gx % t == 0)
    if tx < r:
        raise ValueError(f"slab size {tx} must be >= halo {r}")
    grid = (gx // tx,)

    # pad x by one full slab on each side so prev/next block views exist for
    # the first/last slabs (real neighbor planes under sharding)
    vx = _xpad(v, tx, halo, r)
    x0a = jnp.zeros((1,), jnp.int32) if x0 is None else \
        jnp.asarray(x0, jnp.int32).reshape(1)

    kernel = functools.partial(_advect_component_kernel, r=r, tx=tx,
                               shape=global_shape or (gx, gy, gz))
    slab = lambda off: pl.BlockSpec(            # noqa: E731
        (tx, gy, gz), lambda i, o=off: (i + o, 0, 0),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            slab(0), slab(1), slab(2),
            pl.BlockSpec((3, tx, gy, gz), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tx, gy, gz), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tx, gy, gz), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tx, gy, gz), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gx, gy, gz), v.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x0a, vx, vx, vx, u, cond.astype(jnp.uint8), v)
