"""Pallas (Mosaic) kernel: fused surface-field update (stages 16 + 17 + 18).

The XLA path runs stage 16 (inertia), stage 17 (signed field) and the
`float_density_diffuse_steps` blur passes of stage 18 as separate HBM passes
over the detailed grid (256^3 at the 128^3 bench = 67 MB per f32 field);
fusing them keeps every intermediate — the inertia increments, the signed
field, and all but the last two blur iterates — in VMEM, one HBM read of the
4 inputs and one write of the 3 outputs per x-slab.

Reference semantics reproduced exactly (pinned by tests vs the jnp stages,
which golden tests pin to the shaders):
  16  `densities_inertia.comp:30-62`  — +filled / +neighbour-hits / decay,
      clamp to max_inertia; out-of-grid neighbours read as not-filled
  17  `float_densities.comp:22-28`    — -1 where inertia == 0 else
      inertia / division_coefficient
  18  `diffuse_densities.comp:45-63`  — f' = (1-6k) f + k sum_6, ping-ponged,
      cells with a SOLID parent sim cell keep their stale value (the skip
      mask) but still contribute to neighbours' sums; out-of-grid neighbour
      reads are 0

The x halo follows kernels/jacobi.py: each block receives its H-row
neighbor halos as SEPARATE (1, H, Y, Z) block inputs (jacobi._halo_blocks;
H = blur_steps + 1: one cell for the inertia stencil plus one per blur
pass), so per-pass HBM reads are (tx+2H)/tx of each field instead of the
3x of full prev/cur/next views, and the fields need no physical x-padding.
y/z out-of-grid reads are zero-filled in-register.  Zero halos at the
domain ends reproduce the GLSL robust-access zeros, so the kernel is
shard-agnostic the same way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_fluid.kernels.halo import clamped_halo_maps
from tpu_fluid.kernels.jacobi import _halo_blocks, _zshift


def _neighbor_sum(a, nrows, gy, gz):
    return (_zshift(a, 1, 0, nrows) + _zshift(a, -1, 0, nrows)
            + _zshift(a, 1, 1, gy) + _zshift(a, -1, 1, gy)
            + _zshift(a, 1, 2, gz) + _zshift(a, -1, 2, gz))


def _surface_stages(occ, inertia, f2_old, skip, in_dom, dims, *,
                    steps, k, inc_filled, inc_neigh, required_hits, dec,
                    max_inertia, div_coef):
    """Stages 16-18 on an assembled extended slab (any shape `dims`); every
    input has already been masked to the GLSL robust zero outside `in_dom`.
    Returns (inertia', f1', f2') on the full extended slab — the caller
    keeps the central rows."""
    nrows, gy, gz = dims

    # stage 16: inertia update (densities_inertia.comp:30-62).  Selects are
    # arithmetic (0/1 indicator * branch difference) rather than
    # jnp.where-on-comparison: Mosaic rejects the i1-mask relayout the
    # scalar-branch wheres need on these wide (·, 256, 256) slabs
    # ("Invalid relayout ... i1 ... {0,0} -> {*,*}"); all-int arithmetic is
    # bitwise-identical to the select.
    filled = jnp.minimum(occ.astype(jnp.int32), 1)
    hits = _neighbor_sum(filled, nrows, gy, gz)
    ge = jnp.clip(hits - (required_hits - 1), 0, 1)   # hits >= required
    inc = filled * inc_filled + ge * hits * inc_neigh
    nz = jnp.clip(inc, 0, 1)                          # inc != 0 (inc >= 0)
    increased = inertia + inc
    decreased = jnp.maximum(inertia - dec, 0)
    inertia = jnp.minimum(decreased + nz * (increased - decreased),
                          max_inertia)

    # stage 17: signed field (float_densities.comp:22-28); out-of-domain
    # rows would read -1 from their zero inertia — force the blur's zero.
    # nzi in {0.0, 1.0}: 1*q + 0 = q and 0*q + (-1) = -1, both exact.
    nzi = jnp.clip(inertia, 0, 1).astype(jnp.float32)
    f = nzi * (inertia.astype(jnp.float32) / div_coef) + (nzi - 1.0)
    f = jnp.where(in_dom, f, 0.0)

    # stage 18: ping-pong blur; `a` plays f1, `b` plays f2
    a, b = f, f2_old
    for it in range(steps):
        src, dst = (a, b) if it % 2 == 0 else (b, a)
        blurred = (1.0 - 6.0 * k) * src + k * _neighbor_sum(src, nrows,
                                                            gy, gz)
        res = jnp.where(skip, dst, blurred)
        res = jnp.where(in_dom, res, 0.0)
        if it % 2 == 0:
            b = res
        else:
            a = res
    return inertia, a, b


def _surface_kernel(x0_ref, occ_c, occ_l, occ_r, in_c, in_l, in_r,
                    f2_c, f2_l, f2_r, sk_c, sk_l, sk_r,
                    inertia_out, f1_out, f2_out, *,
                    h, hw, tx, shape, y0, ggy, steps, k, inc_filled,
                    inc_neigh, required_hits, dec, max_inertia, div_coef):
    # `shape` is the GLOBAL detailed grid; x0_ref holds this shard's global
    # detailed-x offset (0 single-device) so the out-of-domain zero rule
    # applies at the true domain ends, not at shard boundaries.  y0/ggy
    # (static) locate this y-chunk in the global y extent the same way —
    # rows outside [0, ggy) are forced to the robust zero after every stage
    # so a chunk rim at the true domain edge can't evolve to -1 and leak
    # into the kept rows' blur (see surface_fused_auto).
    # hw >= h is the ACTUAL halo width of the l/r inputs (rounded up to a
    # divisor of tx on the direct-read path); the extra rings are wasted
    # compute, the kept central rows stay exact.
    gx, gy, gz = shape
    x0 = x0_ref[0]
    i = pl.program_id(0)
    # assembled rows, padded with dummy zero rows to a sublane multiple of 8
    # (Mosaic rejects some mask relayouts on unaligned 3D shapes); the dummy
    # rows sit beyond the halo and never reach the tx output rows
    nrows = -(-(tx + 2 * hw) // 8) * 8
    dummy = nrows - (tx + 2 * hw)

    def asm(l, cur, r):
        parts = [l[0] if l.ndim == 4 else l[...], cur[...],
                 r[0] if r.ndim == 4 else r[...]]
        if dummy:
            parts.append(jnp.zeros((dummy, gy, gz), dtype=cur.dtype))
        return jnp.concatenate(parts, axis=0)

    occ = asm(occ_l, occ_c, occ_r)
    inertia = asm(in_l, in_c, in_r).astype(jnp.int32)
    f2_old = asm(f2_l, f2_c, f2_r)
    skip = asm(sk_l, sk_c, sk_r) != 0

    # global-x in-domain mask: the halo rows of the first/last block lie
    # outside the domain; every field OOB must read as the GLSL robust zero
    gxrow = (x0 + i * tx - hw
             + jax.lax.broadcasted_iota(jnp.int32, (nrows, 1, 1), 0))
    in_dom = (gxrow >= 0) & (gxrow < gx)
    if y0 != 0 or ggy != gy:
        gyrow = y0 + jax.lax.broadcasted_iota(jnp.int32, (1, gy, 1), 1)
        in_dom = in_dom & (gyrow >= 0) & (gyrow < ggy)
    # Mask the INPUT halo rows by in_dom: on the direct-read path the
    # domain-end programs fetch a clamped (in-domain but misplaced) block,
    # and its values must read as the robust zero.  On the materialized
    # path those rows are already zero, so this is bitwise-neutral there.
    occ = jnp.where(in_dom, occ, 0)
    inertia = inertia * in_dom.astype(jnp.int32)
    f2_old = jnp.where(in_dom, f2_old, 0.0)
    skip = skip & in_dom

    inertia, a, b = _surface_stages(
        occ, inertia, f2_old, skip, in_dom, (nrows, gy, gz),
        steps=steps, k=k, inc_filled=inc_filled, inc_neigh=inc_neigh,
        required_hits=required_hits, dec=dec, max_inertia=max_inertia,
        div_coef=div_coef)

    inertia_out[...] = inertia[hw:hw + tx].astype(inertia_out.dtype)
    f1_out[...] = a[hw:hw + tx]
    f2_out[...] = b[hw:hw + tx]


def _surface_kernel2d(x0_ref, occ_c, occ_xl, occ_xr, occ_yl, occ_yr,
                      occ_ll, occ_lr, occ_rl, occ_rr,
                      in_c, in_xl, in_xr, in_yl, in_yr,
                      in_ll, in_lr, in_rl, in_rr,
                      f2_c, f2_xl, f2_xr, f2_yl, f2_yr,
                      f2_ll, f2_lr, f2_rl, f2_rr,
                      sk_c, sk_xl, sk_xr, sk_yl, sk_yr,
                      sk_ll, sk_lr, sk_rl, sk_rr,
                      inertia_out, f1_out, f2_out, *,
                      hx, hy, tx, ty, shape, steps, k, inc_filled,
                      inc_neigh, required_hits, dec, max_inertia, div_coef):
    """(x, y)-blocked variant for planes too large for the 1D slab kernel
    (512^3 detailed: a (tx, 512, 512) slab alone busts VMEM).  Each program
    assembles a (tx+2hx, ty+2hy, gz) extended tile from NINE direct-read
    blocks per field — current, 4 edge halos, 4 corners — via clamped
    hx/hy-unit index maps; garbage from domain-end clamping is zeroed by
    the in_dom mask.  This replaces surface_fused_auto's host-side y-chunk
    assembly (4 fields sliced+padded per chunk — ~4.9 ms of pure copies at
    512^3) with zero data movement outside the kernel."""
    gx, gy, gz = shape
    x0 = x0_ref[0]
    i = pl.program_id(0)
    j = pl.program_id(1)
    ex = tx + 2 * hx                       # major dim needs no 8-alignment
    ey = ty + 2 * hy                       # caller guarantees 8 | ey

    def asm(c, xl, xr, yl, yr, ll, lr, rl, rr):
        left = jnp.concatenate([ll[...], xl[...], lr[...]], axis=1)
        mid = jnp.concatenate([yl[...], c[...], yr[...]], axis=1)
        right = jnp.concatenate([rl[...], xr[...], rr[...]], axis=1)
        return jnp.concatenate([left, mid, right], axis=0)

    occ = asm(occ_c, occ_xl, occ_xr, occ_yl, occ_yr,
              occ_ll, occ_lr, occ_rl, occ_rr)
    inertia = asm(in_c, in_xl, in_xr, in_yl, in_yr,
                  in_ll, in_lr, in_rl, in_rr).astype(jnp.int32)
    f2_old = asm(f2_c, f2_xl, f2_xr, f2_yl, f2_yr,
                 f2_ll, f2_lr, f2_rl, f2_rr)
    skip = asm(sk_c, sk_xl, sk_xr, sk_yl, sk_yr,
               sk_ll, sk_lr, sk_rl, sk_rr) != 0

    gxrow = (x0 + i * tx - hx
             + jax.lax.broadcasted_iota(jnp.int32, (ex, 1, 1), 0))
    gyrow = (j * ty - hy
             + jax.lax.broadcasted_iota(jnp.int32, (1, ey, 1), 1))
    in_dom = ((gxrow >= 0) & (gxrow < gx)
              & (gyrow >= 0) & (gyrow < gy))
    occ = jnp.where(in_dom, occ, 0)
    inertia = inertia * in_dom.astype(jnp.int32)
    f2_old = jnp.where(in_dom, f2_old, 0.0)
    skip = skip & in_dom

    inertia, a, b = _surface_stages(
        occ, inertia, f2_old, skip, in_dom, (ex, ey, gz),
        steps=steps, k=k, inc_filled=inc_filled, inc_neigh=inc_neigh,
        required_hits=required_hits, dec=dec, max_inertia=max_inertia,
        div_coef=div_coef)

    inertia_out[...] = inertia[hx:hx + tx,
                               hy:hy + ty].astype(inertia_out.dtype)
    f1_out[...] = a[hx:hx + tx, hy:hy + ty]
    f2_out[...] = b[hx:hx + tx, hy:hy + ty]


MAX_PLANE = 98304   # gy*gz above which the slab working set exceeds VMEM

# ~10 live extended-tile arrays at 4 B each against a ~70 MB working-set
# budget (the rest of the 100 MB cap goes to the double-buffered in/out
# blocks)
_TILE2D_BUDGET_CELLS = 70 * 1024 * 1024 // 40


def _tile2d(gx: int, gy: int, gz: int, h: int):
    """Pick (tx, ty, hx, hy) for the 2D kernel: halos >= h dividing their
    tile AND the grid extent (the clamped index maps count in halo units),
    ty + 2*hy sublane-aligned, extended tile within the VMEM budget.
    Maximizes core/extended area (least wasted halo compute); returns None
    when no admissible tiling exists (caller falls back to y-chunks)."""
    best = None
    txs = [t for t in (128, 96, 64, 48, 32, 24, 16, 12, 8) if t <= gx]
    tys = [t for t in (128, 96, 64, 48, 32, 24, 16, 8) if t <= gy]
    for hx in range(h, min(gx, 16) + 1):
        if gx % hx:
            continue
        for tx in txs:
            if gx % tx or tx % hx:
                continue
            for hy in range(h, min(gy, 16) + 1):
                if gy % hy:
                    continue
                for ty in tys:
                    if gy % ty or ty % hy or (ty + 2 * hy) % 8:
                        continue
                    ext = (tx + 2 * hx) * (ty + 2 * hy)
                    if ext * gz > _TILE2D_BUDGET_CELLS:
                        continue
                    cand = (tx * ty / ext, tx * ty, tx, ty, hx, hy)
                    if best is None or cand > best:
                        best = cand
    if best is None:
        return None
    _, _, tx, ty, hx, hy = best
    return tx, ty, hx, hy


def surface_fused_2d(occ, inertia, f2, skip, *, steps, k, inc_filled,
                     inc_neigh, required_hits, dec, max_inertia, div_coef,
                     tile=None, interpret: bool = False):
    """(x, y)-blocked fused stages 16-18 (see _surface_kernel2d): the
    large-plane path with no host-side chunk assembly.  Single-device only
    (the sharded path keeps materialized x-halos + y-chunks)."""
    gx, gy, gz = occ.shape
    h = steps + 1
    tile = tile or _tile2d(gx, gy, gz, h)
    if tile is None:
        raise ValueError(f"no admissible 2D tiling for {occ.shape}, h={h}")
    tx, ty, hx, hy = tile
    rx, ry = tx // hx, ty // hy
    last_x, last_y = gx // hx - 1, gy // hy - 1
    nbx, nby = gx // tx, gy // ty
    skip = skip.astype(jnp.uint8)
    x0a = jnp.zeros((1,), jnp.int32)

    V = pltpu.VMEM
    xlo, xhi = clamped_halo_maps(rx, last_x)
    ylo, yhi = clamped_halo_maps(ry, last_y)
    cur = pl.BlockSpec((tx, ty, gz), lambda i, j: (i, j, 0),
                       memory_space=V)
    xl = pl.BlockSpec((hx, ty, gz), lambda i, j: (xlo(i), j, 0),
                      memory_space=V)
    xr = pl.BlockSpec((hx, ty, gz), lambda i, j: (xhi(i), j, 0),
                      memory_space=V)
    yl = pl.BlockSpec((tx, hy, gz), lambda i, j: (i, ylo(j), 0),
                      memory_space=V)
    yr = pl.BlockSpec((tx, hy, gz), lambda i, j: (i, yhi(j), 0),
                      memory_space=V)
    ll = pl.BlockSpec((hx, hy, gz), lambda i, j: (xlo(i), ylo(j), 0),
                      memory_space=V)
    lr = pl.BlockSpec((hx, hy, gz), lambda i, j: (xlo(i), yhi(j), 0),
                      memory_space=V)
    rl = pl.BlockSpec((hx, hy, gz), lambda i, j: (xhi(i), ylo(j), 0),
                      memory_space=V)
    rr = pl.BlockSpec((hx, hy, gz), lambda i, j: (xhi(i), yhi(j), 0),
                      memory_space=V)
    per_field = [cur, xl, xr, yl, yr, ll, lr, rl, rr]
    fields = []
    for a in (occ, inertia, f2, skip):
        fields += [a] * 9
    out_spec = pl.BlockSpec((tx, ty, gz), lambda i, j: (i, j, 0),
                            memory_space=V)
    kern = functools.partial(
        _surface_kernel2d, hx=hx, hy=hy, tx=tx, ty=ty,
        shape=(gx, gy, gz), steps=steps, k=float(k),
        inc_filled=int(inc_filled), inc_neigh=int(inc_neigh),
        required_hits=int(required_hits), dec=int(dec),
        max_inertia=int(max_inertia), div_coef=float(div_coef))
    return pl.pallas_call(
        kern,
        grid=(nbx, nby),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + per_field * 4,
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((gx, gy, gz), inertia.dtype),
                   jax.ShapeDtypeStruct((gx, gy, gz), jnp.float32),
                   jax.ShapeDtypeStruct((gx, gy, gz), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(x0a, *fields)


def _slab_tx(gx: int, gy: int, gz: int, h: int, tx: int) -> int:
    """Slab rows per program: the working set is ~8 live (tx+2h, gy, gz)
    f32 temporaries; shrink tx on large planes.  Falls back to the smallest
    divisor of gx >= h when nothing in [h, tx] divides (e.g. gx = 121)."""
    tx = max(h, min(tx, max(h, 1048576 // (gy * gz))))
    if gx % tx != 0:
        tx = next((t for t in range(min(tx, gx), h - 1, -1)
                   if gx % t == 0), None)
        if tx is None:
            tx = next(t for t in range(h, gx + 1) if gx % t == 0)
    return tx


def surface_fused_pallas(occ: jnp.ndarray, inertia: jnp.ndarray,
                         f2: jnp.ndarray, skip: jnp.ndarray, *,
                         steps: int, k: float, inc_filled: int,
                         inc_neigh: int, required_hits: int, dec: int,
                         max_inertia: int, div_coef: float,
                         tx: int = 16, halos=None, x0=None,
                         global_gx: int | None = None,
                         y0: int = 0, global_gy: int | None = None,
                         interpret: bool = False):
    """Fused stages 16-18 on a detailed grid (or a local x-slab of one).

    occ: (DX,DY,DZ) uint8 occupancy; inertia: uint8 or int32 (output
    keeps the input dtype); f2: float32 (stale
    ping-pong buffer); skip: uint8 solid-parent mask.
    Returns (inertia', f1', f2').

    Sharded use (inside shard_map): the arrays are local x-slabs, `halos`
    the ((left, right), ...) h-wide neighbor planes for (occ, inertia, f2,
    skip) in that order (h = steps + 1), `x0` the shard's global detailed-x
    offset (traced scalar) and `global_gx` the full detailed x extent.
    Output central rows are bitwise-identical to the single-device kernel:
    the h-wide halo loses one exact ring per stage, ending exactly at the
    block boundary.
    """
    gx, gy, gz = occ.shape
    h = steps + 1
    tx = _slab_tx(gx, gy, gz, h, tx)
    nb = gx // tx

    halos = halos or (None,) * 4
    skip = skip.astype(jnp.uint8)
    x0a = jnp.zeros((1,), jnp.int32) if x0 is None else \
        jnp.asarray(x0, jnp.int32).reshape(1)
    out_spec = pl.BlockSpec((tx, gy, gz), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    cur = pl.BlockSpec((tx, gy, gz), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    common = dict(
        grid=(nb,),
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((gx, gy, gz), inertia.dtype),
                   jax.ShapeDtypeStruct((gx, gy, gz), jnp.float32),
                   jax.ShapeDtypeStruct((gx, gy, gz), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def kern_of(hw):
        return functools.partial(
            _surface_kernel, h=h, hw=hw, tx=tx,
            shape=(global_gx or gx, gy, gz),
            y0=y0, ggy=global_gy if global_gy is not None else gy,
            steps=steps,
            k=float(k), inc_filled=int(inc_filled),
            inc_neigh=int(inc_neigh),
            required_hits=int(required_hits), dec=int(dec),
            max_inertia=int(max_inertia), div_coef=float(div_coef))

    # direct path (single-device): halo blocks read straight out of the
    # fields via hw-row-unit clamped index maps — no halo materialization.
    # hw = h rounded up to a divisor of tx; domain-end garbage is zeroed by
    # the in_dom input mask inside the kernel.
    hw = next((d for d in range(h, tx + 1) if tx % d == 0 and gx % d == 0),
              None)
    if all(halo is None for halo in halos) and hw is not None:
        lo, hi = clamped_halo_maps(tx // hw, gx // hw - 1)
        lspec = pl.BlockSpec((hw, gy, gz), lambda i: (lo(i), 0, 0),
                             memory_space=pltpu.VMEM)
        rspec = pl.BlockSpec((hw, gy, gz), lambda i: (hi(i), 0, 0),
                             memory_space=pltpu.VMEM)
        fields = []
        for a in (occ, inertia, f2, skip):
            fields += [a, a, a]
        return pl.pallas_call(
            kern_of(hw),
            in_specs=[smem] + [cur, lspec, rspec] * 4,
            **common,
        )(x0a, *fields)

    fields = []
    for a, halo in zip((occ, inertia, f2, skip), halos):
        hl, hr = _halo_blocks(a, nb, tx, h, halo)
        fields += [a, hl, hr]
    halo_spec = pl.BlockSpec((1, h, gy, gz), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern_of(h),
        in_specs=[smem] + [cur, halo_spec, halo_spec] * 4,
        **common,
    )(x0a, *fields)


def surface_fused_auto(occ, inertia, f2, skip, *, steps, k, inc_filled,
                       inc_neigh, required_hits, dec, max_inertia, div_coef,
                       tx: int = 16, halos=None, x0=None,
                       global_gx: int | None = None,
                       max_plane: int = MAX_PLANE,
                       use_2d: bool = True,
                       interpret: bool = False):
    """surface_fused_pallas for ANY plane size: grids whose (gy, gz) plane
    fits the slab VMEM budget run the kernel directly; larger planes (the
    256^3 sim / 512^3 detailed config: 512*512 > MAX_PLANE) are split into
    y-chunks extended by an h-wide overlap of REAL neighbor rows.  Each
    pass of the fused stencil chain loses one exact ring, so after the
    h = steps+1 stages the kept central rows are bitwise-identical to the
    unchunked kernel; the rim is discarded.  Rows beyond the true y domain
    are zero-filled and pinned to zero after every stage inside the kernel
    (y0/global_gy), matching the GLSL robust-access zero of the unchunked
    path.  Overhead: 2h overlap rows per chunk (~5% at 512-wide chunks)."""
    gx, gy, gz = occ.shape
    h = steps + 1
    kw = dict(steps=steps, k=k, inc_filled=inc_filled, inc_neigh=inc_neigh,
              required_hits=required_hits, dec=dec, max_inertia=max_inertia,
              div_coef=div_coef, tx=tx, x0=x0, global_gx=global_gx,
              interpret=interpret)
    if gy * gz <= max_plane:
        return surface_fused_pallas(occ, inertia, f2, skip, halos=halos,
                                    **kw)
    # single-device large plane: the (x, y)-blocked direct-read kernel, no
    # host-side chunk assembly (bitwise-equal to the y-chunk path, pinned
    # by tests/test_surface_fused.py)
    if (use_2d and (halos is None or all(hl is None for hl in halos))
            and x0 is None and global_gx is None):
        tile = _tile2d(gx, gy, gz, h)
        if tile is not None:
            return surface_fused_2d(
                occ, inertia, f2, skip, steps=steps, k=k,
                inc_filled=inc_filled, inc_neigh=inc_neigh,
                required_hits=required_hits, dec=dec,
                max_inertia=max_inertia, div_coef=div_coef, tile=tile,
                interpret=interpret)
    # chunk width: keep the extended plane under the budget, sublane-aligned
    by = max(8, ((max_plane // gz - 2 * h) // 8) * 8)
    halos = halos or (None,) * 4

    def ysl(a, lo, hi):
        """Rows [lo, hi) of axis 1 with zero fill outside [0, gy)."""
        core = a[:, max(0, lo):min(gy, hi)]
        pl_, ph = max(0, -lo), max(0, hi - gy)
        if pl_ or ph:
            pad = [(0, 0)] * a.ndim
            pad[1] = (pl_, ph)
            core = jnp.pad(core, pad)
        return core

    outs = []
    for y0c in range(0, gy, by):
        y1 = min(gy, y0c + by)
        lo, hi = y0c - h, y1 + h
        ch = tuple(None if hl is None else (ysl(hl[0], lo, hi),
                                            ysl(hl[1], lo, hi))
                   for hl in halos)
        i_c, f1_c, f2_c = surface_fused_pallas(
            ysl(occ, lo, hi), ysl(inertia, lo, hi), ysl(f2, lo, hi),
            ysl(skip, lo, hi), halos=ch, y0=lo, global_gy=gy, **kw)
        keep = slice(h, h + (y1 - y0c))
        outs.append((i_c[:, keep], f1_c[:, keep], f2_c[:, keep]))
    return tuple(jnp.concatenate(parts, axis=1) for parts in zip(*outs))
