"""Pallas (Mosaic) kernel: k-fused Jacobi pressure sweeps.

The reference runs 200 separate Jacobi dispatches with pipeline barriers
(`fluid_flow_sections.h:300-313`); the XLA fori_loop version already fuses
each sweep into one pass but still moves ~34 MB of HBM per iteration
(~7 GB per solve at 128^3).  This kernel performs K sweeps per HBM pass:
x-slabs of the pressure field (+K-cell halo via separate per-block halo
inputs, see _halo_blocks) stay resident in VMEM while K Jacobi updates run
back-to-back — the halo region's values go progressively stale, which is
exactly why the halo must be >= K cells wide.  HBM reads per pass are
(tx+2K)/tx of the field (the halo blocks), so wide slabs with a narrow
halo amortize the traffic; grids that fit VMEM whole skip the slab
machinery entirely (_whole_grid_kernel).

Per-frame constants are folded outside the kernel (see
stages/pressure.jacobi_solve):
  rd  = 1/aii where the cell updates (WATER, aii > 0), else 0
  c2  = (n_air * p_air - b) / aii  (b = div * rho * dx / dt)
The loop state is the WATER-MASKED pressure q = where(water, p, 0) — the
exact array every sweep's neighbor sum consumes — so the water mask never
enters the kernel at all (25% less input HBM per pass and one select fewer
per sweep than carrying p + water).  One sweep:
    q' = where(rd > 0, (sum_6 zeropad(q)) * rd + c2, q)
which matches `pressure.comp:52-77` exactly (air/inactive neighbors
contribute the constant folded into c2; solid neighbors are excluded from
both the sum and aii): by induction q stays where(water, p, 0) bitwise —
non-updating water cells (aii = 0) keep their initial boundary value in q,
non-water cells stay 0 and contribute nothing.  The caller reconstructs
p = where(water, q, boundary_value) once after the solve
(stages/pressure.poisson_solve).

Out-of-domain neighbors must read as non-water zero pressure, so all x pads
are ZERO-filled (q = 0, rd = 0 in the pad kills both the neighbor sum and
the update there).  That same convention makes the kernel shard-agnostic:
under shard_map (`jacobi_sweeps_sharded`), the k-wide pad rows adjacent to
each local block are filled with the neighbor shard's boundary planes via
`jax.lax.ppermute` — domain-end shards receive ppermute's zeros, which is
exactly the single-device zero pad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_fluid.kernels.halo import clamped_halo_maps


def _zshift(a, d, axis, size):
    """out[i] = a[i+d] along axis, zero-padded, for VMEM values."""
    if d == 0:
        return a
    pads = [(0, 0)] * a.ndim
    idx = [slice(None)] * a.ndim
    if d > 0:
        pads[axis] = (0, d)
        idx[axis] = slice(d, d + size)
    else:
        pads[axis] = (-d, 0)
        idx[axis] = slice(0, size)
    return jnp.pad(a, pads)[tuple(idx)]


def _decode_rd(rd):
    """Widen a u8 aii-code into the f32 reciprocal diagonal: rd =
    where(code > 0, 1 / max(code, 1), 0) — the exact formula the XLA
    construction applies to its f32 aii (stages/pressure.py), so decoded
    values are bitwise identical.  rd ships as the 7-valued code ({0} and
    aii in 1..6) to quarter its HBM stream: at 256^3 that is ~16 MB/pass
    of the solve's ~90 MB (and the sharded variant's rd halo ppermutes
    shrink 4x the same way).  BOTH production Poisson solves ship u8: the
    pressure solve and the volume projection go through
    stages/pressure.poisson_solve, which encodes rd there.  f32 inputs
    pass through untouched (some tests hand prebuilt f32 fields)."""
    if rd.dtype == jnp.uint8:
        # via i32: Mosaic has no direct u8 -> f32 cast
        codef = rd.astype(jnp.int32).astype(jnp.float32)
        rd = jnp.where(codef > 0, 1.0 / jnp.maximum(codef, 1.0), 0.0)
    return rd


def _sweeps(q, rd, c2, k, nrows, gy, gz):
    # Select-free sweep: non-updating cells have rd == 0, so
    # q' = neigh*0 + c2e keeps them at their input value when c2e is
    # pre-folded to that value — ONE select per pass instead of one per
    # sweep (bitwise-identical: 0*finite + x == x, incl. -0 + x).
    #
    # TRAPEZOID window: sweep s only has valid inputs — and only needs to
    # produce outputs — on rows [s, nrows - s): later sweeps and the final
    # [h, h + tx) output never consume anything outside that window, so the
    # computed row range SHRINKS by 2 per sweep instead of running all
    # nrows every sweep.  Rows are the major (non-tiled) axis, so the
    # narrowing slices are pure addressing; per-pass VPU+VMEM work drops
    # from k*(tx+2k) to k*tx + k(k-1) row-sweeps (1.5x -> 1.19x
    # amplification at k=4, tx=16).  Bitwise identical: the skipped rows'
    # values were computed and discarded before.
    # rd may arrive as the u8 aii-code (see _decode_rd): fold and decode
    # lazily per sweep so the f32 reciprocal never exists as a full
    # (tx+2k)-row VMEM temp — only the u8 code is held across sweeps.
    code = rd if rd.dtype == jnp.uint8 else None
    # u8 vector compares are unsupported by Mosaic ("Target does not
    # support this comparison") — widen to i32 for the fold's mask
    c2e = jnp.where((code.astype(jnp.int32) > 0) if code is not None
                    else (rd > 0.0), c2, q)
    for s in range(1, k + 1):
        lo, hi = s, nrows - s
        rds = _decode_rd(code[lo:hi]) if code is not None else rd[lo:hi]
        mid = q[1:-1]
        q = rds * (q[2:] + q[:-2]
                   + _zshift(mid, 1, 1, gy) + _zshift(mid, -1, 1, gy)
                   + _zshift(mid, 1, 2, gz) + _zshift(mid, -1, 2, gz)
                   ) + c2e[lo:hi]
    return q


def _jacobi_kernel(q_cur, q_l, q_r, rd_cur, rd_l, rd_r,
                   c2_cur, c2_l, c2_r,
                   out_ref, *, k, h, tx, shape):
    """K fused sweeps on one x-slab.  Halos arrive as SEPARATE h-row block
    inputs (q_l/q_r etc., see _halo_blocks) instead of full prev/next block
    views: per-pass HBM reads drop from 3x to (tx+2h)/tx, which unlocks
    tx >> h on big planes (the 256^3 win: ~65 ms -> ~30 ms per solve)."""
    _, gy, gz = shape

    def asm(l, cur, r):
        return jnp.concatenate([l[0], cur[...], r[0]], axis=0)

    q = asm(q_l, q_cur, q_r)                  # (tx + 2h, gy, gz)
    rd = asm(rd_l, rd_cur, rd_r)
    c2 = asm(c2_l, c2_cur, c2_r)
    # k == h: the trapezoid window of _sweeps lands exactly on the
    # (h, h + tx) output rows
    out_ref[...] = _sweeps(q, rd, c2, k, tx + 2 * h, gy, gz)


def _jacobi_kernel_direct(q_cur, q_l, q_r, rd_cur, rd_l, rd_r,
                          c2_cur, c2_l, c2_r,
                          out_ref, *, k, h, tx, shape, nb):
    """_jacobi_kernel with the halo blocks read DIRECTLY from the field
    arrays via h-row-unit BlockSpecs (no per-pass halo materialization —
    that cost ~9 ms/step of copies at 256^3).  Domain-end programs read a
    clamped (garbage) block; it is masked to the zero-pad convention here.
    Requires h | tx (index maps count in h-row units)."""
    _, gy, gz = shape
    i = pl.program_id(0)

    def asm(l, cur, r):
        lv = jnp.where(i == 0, jnp.zeros_like(l[...]), l[...])
        rv = jnp.where(i == nb - 1, jnp.zeros_like(r[...]), r[...])
        return jnp.concatenate([lv, cur[...], rv], axis=0)

    q = asm(q_l, q_cur, q_r)                  # (tx + 2h, gy, gz)
    rd = asm(rd_l, rd_cur, rd_r)
    c2 = asm(c2_l, c2_cur, c2_r)
    out_ref[...] = _sweeps(q, rd, c2, k, tx + 2 * h, gy, gz)  # k == h


def _whole_grid_kernel(q_ref, rd_ref, c2_ref, out_ref, *, iters, shape):
    """All `iters` sweeps in one kernel with the full grid VMEM-resident —
    ONE HBM read of (q, rd, c2) and one write of q for the entire solve,
    vs one per K sweeps for the slab kernel.  VPU-bound; measured 2.83 ms
    vs 3.51 ms (K-slab) per 199-sweep 128^3 solve, bitwise identical."""
    gx, gy, gz = shape
    q = q_ref[...]
    rd = _decode_rd(rd_ref[...])
    # select-free form, see _sweeps: non-updating cells (rd == 0) are held
    # by the folded constant, no per-sweep where
    c2e = jnp.where(rd > 0.0, c2_ref[...], q)

    def body(_, q):
        return rd * (_zshift(q, 1, 0, gx) + _zshift(q, -1, 0, gx)
                     + _zshift(q, 1, 1, gy) + _zshift(q, -1, 1, gy)
                     + _zshift(q, 1, 2, gz) + _zshift(q, -1, 2, gz)) + c2e

    out_ref[...] = jax.lax.fori_loop(0, iters, body, q)


# Whole-grid VMEM residency needs ~6 live grid-sized f32 arrays (q, rd, c2,
# neighbor accumulator, shift temp, update mask); cap the grid so that stays
# comfortably inside v5e's 128 MB VMEM.
_WHOLE_GRID_MAX_CELLS = 128 * 128 * 128

# Unroll the pass chain up to this many passes (bounds compile time; a
# 200-iter solve is <= 50 passes at k=4)
_UNROLL_PASSES = 64


def _whole_grid_jacobi(q, rd, c2, n_iters, interpret):
    kern = functools.partial(_whole_grid_kernel, iters=n_iters,
                             shape=q.shape)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(q, rd, c2)


def _slab_sizes(gx: int, gy: int, gz: int, k: int | None, tx: int | None,
                rd_itemsize: int = 4):
    """Pick (k, tx) fitting the K-sweep working set in VMEM.

    k/tx None means "measured-best default": (8, 16) for f32 rd, (4, 32)
    for the u8 aii-code (see the last paragraph).  Explicit values are
    honored, subject only to the VMEM budget loop below.

    VMEM model (f32 row-equivalents of the (gy, gz) plane): double-buffered
    blocks 2*(3*tx + 6*k) + out 2*tx, assembled q/rd/c2 3*(tx+2k), loop
    temps ~3*(tx+2k) -> 14*tx + 28*k plane-rows, against a ~110 MB
    empirical compile budget.  Shrink k before tx: wide slabs with a
    narrow halo amortize best (256^3 sweep, 199 sweeps: (4,16) 43.0 ms <
    (8,16) 48.8 < (4,8) 57.6 < (2,32) 65.3; f32 (>=4,32) exceeds VMEM).

    When rd ships as the u8 aii-code (`_decode_rd`) its blocks + assembly
    are 4x smaller, which admits one-wider slabs: rd's ~2.25*(tx+2k) rows
    come off the model and the empirical compile envelope re-measures at
    ~120 MB — (4,32) compiles and wins at 256^3 (0.444 vs 0.474 ms/pass
    against (4,16); (8,32)/(4,64) still exceed VMEM, k=2/k=8 are slower)."""
    u8 = rd_itemsize == 1
    if k is None:
        k = 4 if u8 else 8
    if tx is None:
        tx = 32 if u8 else 16
    budget_rows = ((120 if u8 else 110) * 1024 * 1024 // 4) // (gy * gz)
    rd_save = 2.25 if u8 else 0.0
    tx = min(tx, gx)
    k = min(k, tx)
    while 14 * tx + 28 * k - rd_save * (tx + 2 * k) > budget_rows:
        if k > 1 and k >= tx // 2:
            k //= 2
        elif k > 1 and (14 * tx + 28 * (k // 2)
                        - rd_save * (tx + k) <= budget_rows):
            k //= 2
        elif tx > 1:
            tx //= 2
        else:
            break
    tx = max(1, tx)
    if gx % tx != 0:
        tx = next(t for t in range(min(tx, gx), 0, -1) if gx % t == 0)
    return min(k, tx), tx


def _halo_blocks(a, nb, tx, h, edges=None):
    """Per-block h-row x-halos of a (gx, Y, Z) array: returns (hl, hr) of
    shape (nb, h, Y, Z) where hl[i] is the h rows just before block i and
    hr[i] the h rows just after.  Domain-end halos are `edges` (the
    ppermuted neighbor planes under shard_map) or zeros."""
    gy, gz = a.shape[1], a.shape[2]
    ar = a.reshape(nb, tx, gy, gz)
    el, er = edges if edges is not None else (
        jnp.zeros((h, gy, gz), a.dtype), jnp.zeros((h, gy, gz), a.dtype))
    hl = jnp.concatenate([el[None], ar[:-1, tx - h:]], axis=0)
    hr = jnp.concatenate([ar[1:, :h], er[None]], axis=0)
    return hl, hr


def _one_pass(q, rd_in, c2_in, kk, tx, shape, interpret, edges_q=None,
              edges_rc=(None, None)):
    """One Pallas pass of kk fused sweeps.  rd_in/c2_in are (field, hl, hr)
    triples when the caller prebuilt their halos (loop-invariant), else raw
    arrays.  Single-device passes with kk | tx take the DIRECT path: halo
    blocks are read straight out of the field arrays (kk-row-unit index
    maps, domain ends masked in-kernel) — no halo materialization at all."""
    gx, gy, gz = shape
    nb = gx // tx
    cur = pl.BlockSpec((tx, gy, gz), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tx, gy, gz), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    direct = (edges_q is None and edges_rc == (None, None)
              and not isinstance(rd_in, tuple) and tx % kk == 0 and nb > 0)
    if direct:
        lo, hi = clamped_halo_maps(tx // kk, nb * (tx // kk) - 1)
        lspec = pl.BlockSpec((kk, gy, gz), lambda i: (lo(i), 0, 0),
                             memory_space=pltpu.VMEM)
        rspec = pl.BlockSpec((kk, gy, gz), lambda i: (hi(i), 0, 0),
                             memory_space=pltpu.VMEM)
        kern = functools.partial(_jacobi_kernel_direct, k=kk, h=kk, tx=tx,
                                 shape=shape, nb=nb)
        return pl.pallas_call(
            kern, grid=(nb,),
            in_specs=[cur, lspec, rspec] * 3,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((gx, gy, gz), q.dtype),
            compiler_params=params, interpret=interpret,
        )(q, q, q, rd_in, rd_in, rd_in, c2_in, c2_in, c2_in)

    qhl, qhr = _halo_blocks(q, nb, tx, kk, edges_q)

    def triple(f, edges):
        if isinstance(f, tuple):
            return f
        hl, hr = _halo_blocks(f, nb, tx, kk, edges)
        return (f, hl, hr)

    rd, rdhl, rdhr = triple(rd_in, edges_rc[0])
    c2, c2hl, c2hr = triple(c2_in, edges_rc[1])
    kern = functools.partial(_jacobi_kernel, k=kk, h=kk, tx=tx, shape=shape)
    halo = pl.BlockSpec((1, kk, gy, gz), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[cur, halo, halo] * 3,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((gx, gy, gz), q.dtype),
        compiler_params=params,
        interpret=interpret,
    )(q, qhl, qhr, rd, rdhl, rdhr, c2, c2hl, c2hr)


def jacobi_sweeps_pallas(q: jnp.ndarray, rd: jnp.ndarray, c2: jnp.ndarray,
                         n_iters: int,
                         k: int | None = None, tx: int | None = None,
                         interpret: bool = False,
                         whole_grid: bool | None = None) -> jnp.ndarray:
    """Run n_iters Jacobi sweeps on a full (single-device) grid.

    Grids whose working set fits VMEM run ALL sweeps in one kernel
    (`_whole_grid_kernel`); larger grids run K fused sweeps per Pallas pass
    over x-slabs.  `q` is the water-masked pressure where(water, p, 0) —
    see the module docstring.  `whole_grid` forces the path (tests)."""
    gx, gy, gz = q.shape
    if whole_grid is None:
        whole_grid = gx * gy * gz <= _WHOLE_GRID_MAX_CELLS
    if whole_grid:
        return _whole_grid_jacobi(q, rd, c2, n_iters, interpret)
    k, tx = _slab_sizes(gx, gy, gz, k, tx, rd.dtype.itemsize)
    shape = (gx, gy, gz)
    nb = gx // tx

    passes_full, rem = divmod(n_iters, k)
    if passes_full:
        if tx % k == 0:
            # direct path: halo blocks read straight from the fields
            rdh, c2h = rd, c2
        else:
            # rd/c2 halos are loop-invariant: build once, reuse every pass
            rdh = (rd, *_halo_blocks(rd, nb, tx, k))
            c2h = (c2, *_halo_blocks(c2, nb, tx, k))

        if passes_full <= _UNROLL_PASSES:
            # UNROLLED pass chain: a lax.fori_loop carry forces XLA to
            # copy q between the pallas output and the loop slot every
            # pass (+10 ms/solve at 256^3, profiled); the straight-line
            # chain lets buffer assignment alias them (43 -> 32.8 ms,
            # bitwise equal).  Compile cost is paid once (utils/cache.py).
            for _ in range(passes_full):
                q = _one_pass(q, rdh, c2h, k, tx, shape, interpret)
        else:
            def body(_, qq):
                return _one_pass(qq, rdh, c2h, k, tx, shape, interpret)
            q = jax.lax.fori_loop(0, passes_full, body, q)
    if rem:
        q = _one_pass(q, rd, c2, rem, tx, shape, interpret)
    return q


def jacobi_sweeps_sharded(q: jnp.ndarray, rd: jnp.ndarray, c2: jnp.ndarray,
                          n_iters: int, axis_name: str,
                          k: int | None = None, tx: int | None = None,
                          interpret: bool = False) -> jnp.ndarray:
    """Sharded variant, called INSIDE shard_map on local x-slab blocks.

    Per K-sweep pass the k boundary planes of the pressure slab are
    exchanged with the x-neighbor shards over ICI (`jax.lax.ppermute`, two
    neighbor sends) — the TPU-native replacement for the reference's 200
    barrier-separated dispatches (`fluid_flow_sections.h:300-313`); the
    constant fields (rd/c2) exchange their halos once per solve.
    Domain-end shards receive ppermute's zeros = the zero-pad convention.
    """
    lx, gy, gz = q.shape
    k, tx = _slab_sizes(lx, gy, gz, k, tx, rd.dtype.itemsize)
    n = jax.lax.axis_size(axis_name)
    up = [(j, j + 1) for j in range(n - 1)]      # send +x
    down = [(j + 1, j) for j in range(n - 1)]    # send -x
    shape = (lx, gy, gz)
    nb = lx // tx

    def edges(a, h):
        """This shard's domain-edge halos: the neighbor shards' boundary
        planes over ICI; domain-end shards receive ppermute's zeros = the
        single-device zero-pad convention.  A 1-device mesh has no
        neighbors: zeros directly (XLA:TPU's empty-pair collective-permute
        measured ms-scale on silicon — round-5 NOTES)."""
        if n == 1:
            return jnp.zeros_like(a[lx - h:]), jnp.zeros_like(a[:h])
        from_left = jax.lax.ppermute(a[lx - h:], axis_name, up)
        from_right = jax.lax.ppermute(a[:h], axis_name, down)
        return from_left, from_right

    passes_full, rem = divmod(n_iters, k)
    if passes_full:
        rdh = (rd, *_halo_blocks(rd, nb, tx, k, edges(rd, k)))
        c2h = (c2, *_halo_blocks(c2, nb, tx, k, edges(c2, k)))

        if passes_full <= _UNROLL_PASSES:
            # unrolled for the same loop-carry-copy reason as the
            # single-device driver (also unrolls the per-pass ppermutes
            # into the straight-line program)
            for _ in range(passes_full):
                q = _one_pass(q, rdh, c2h, k, tx, shape, interpret,
                              edges_q=edges(q, k))
        else:
            def body(_, qq):
                return _one_pass(qq, rdh, c2h, k, tx, shape, interpret,
                                 edges_q=edges(qq, k))
            q = jax.lax.fori_loop(0, passes_full, body, q)
    if rem:
        q = _one_pass(q, rd, c2, rem, tx, shape, interpret,
                      edges_q=edges(q, rem),
                      edges_rc=(edges(rd, rem), edges(c2, rem)))
    return q
