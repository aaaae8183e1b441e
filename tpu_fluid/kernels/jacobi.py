"""Pallas (Mosaic) kernel: k-fused Jacobi pressure sweeps.

The reference runs 200 separate Jacobi dispatches with pipeline barriers
(`fluid_flow_sections.h:300-313`); the XLA fori_loop version already fuses
each sweep into one pass but still moves ~34 MB of HBM per iteration
(~7 GB per solve at 128^3).  This kernel performs K sweeps per HBM pass:
x-slabs of the pressure field (+K-cell halo via prev/cur/next block views)
stay resident in VMEM while K Jacobi updates run back-to-back — the halo
region's values go progressively stale, which is exactly why the halo must
be >= K cells wide.  HBM traffic drops by ~K/3 (the 3x is halo re-reads).

Per-frame constants are folded outside the kernel (see
stages/pressure.jacobi_solve):
  rd  = 1/aii where the cell updates (WATER, aii > 0), else 0
  c2  = (n_air * p_air - b) / aii  (b = div * rho * dx / dt)
  wat = WATER mask (neighbor-sum mask; distinct from rd>0 only for the
        degenerate all-solid-neighbors water cell)
One sweep:  p' = where(rd > 0, (sum_6 zeropad(where(wat, p, 0))) * rd + c2, p)
which matches `pressure.comp:52-77` exactly (air/inactive neighbors
contribute the constant folded into c2; solid neighbors are excluded from
both the sum and aii).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def _jacobi_kernel(p_prev, p_cur, p_next, rd_prev, rd_cur, rd_next,
                   c2_prev, c2_cur, c2_next, w_prev, w_cur, w_next,
                   out_ref, *, k, tx, shape):
    gx, gy, gz = shape
    h = k  # halo width
    i = pl.program_id(0)

    def asm(prev, cur, nxt):
        return jnp.concatenate([prev[tx - h:], cur[...], nxt[:h]], axis=0)

    p = asm(p_prev, p_cur, p_next)            # (tx + 2h, gy, gz)
    rd = asm(rd_prev, rd_cur, rd_next)
    c2 = asm(c2_prev, c2_cur, c2_next)
    wat = asm(w_prev, w_cur, w_next) != 0

    # zero out halo rows that lie outside the global domain (the x-pad is
    # edge-replicated by the caller; out-of-domain neighbors must read as
    # non-water / zero pressure, matching the XLA zero-padded shifts)
    rows = i * tx - h + jax.lax.broadcasted_iota(
        jnp.int32, (tx + 2 * h, gy, gz), 0)
    inside = (rows >= 0) & (rows < gx)
    wat = wat & inside
    upd = (rd > 0.0) & inside

    nrows = tx + 2 * h
    for _ in range(k):
        pw = jnp.where(wat, p, 0.0)
        neigh = (_zshift(pw, 1, 0, nrows) + _zshift(pw, -1, 0, nrows)
                 + _zshift(pw, 1, 1, gy) + _zshift(pw, -1, 1, gy)
                 + _zshift(pw, 1, 2, gz) + _zshift(pw, -1, 2, gz))
        p = jnp.where(upd, neigh * rd + c2, p)

    out_ref[...] = p[h:h + tx]


def jacobi_sweeps_pallas(p: jnp.ndarray, rd: jnp.ndarray, c2: jnp.ndarray,
                         water: jnp.ndarray, n_iters: int,
                         k: int = 8, tx: int = 16) -> jnp.ndarray:
    """Run n_iters Jacobi sweeps; K per Pallas pass."""
    gx, gy, gz = p.shape
    # cap the slab so the K-sweep working set stays in VMEM on large planes
    tx = max(1, min(tx, max(1, 262144 // (gy * gz))))
    if gx % tx != 0:
        tx = next(t for t in range(min(tx, gx), 0, -1) if gx % t == 0)
    k = min(k, tx)
    grid = (gx // tx,)

    def xpad(a):
        # one slab of edge padding on each side so prev/next views exist;
        # out-of-domain rows are masked inside the kernel
        return jnp.pad(a, ((tx, tx), (0, 0), (0, 0)), mode="edge")

    slab = lambda off: pl.BlockSpec(            # noqa: E731
        (tx, gy, gz), lambda i, o=off: (i + o, 0, 0),
        memory_space=pltpu.VMEM)

    passes_full, rem = divmod(n_iters, k)

    def one_pass(p, kk):
        kern_k = functools.partial(_jacobi_kernel, k=kk, tx=tx,
                                   shape=(gx, gy, gz))
        return pl.pallas_call(
            kern_k,
            grid=grid,
            in_specs=[slab(0), slab(1), slab(2)] * 4,
            out_specs=pl.BlockSpec((tx, gy, gz), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((gx, gy, gz), p.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*([xpad(p)] * 3 + [rdp] * 3 + [c2p] * 3 + [watp] * 3))

    rdp = xpad(rd)
    c2p = xpad(c2)
    watp = xpad(water.astype(jnp.uint8))

    if passes_full:
        def body(_, pp):
            return one_pass(pp, k)
        p = jax.lax.fori_loop(0, passes_full, body, p)
    if rem:
        p = one_pass(p, rem)
    return p
