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


def _jacobi_kernel(q_prev, q_cur, q_next, rd_prev, rd_cur, rd_next,
                   c2_prev, c2_cur, c2_next,
                   out_ref, *, k, tx, shape):
    _, gy, gz = shape
    h = k  # halo width

    def asm(prev, cur, nxt):
        return jnp.concatenate([prev[tx - h:], cur[...], nxt[:h]], axis=0)

    q = asm(q_prev, q_cur, q_next)            # (tx + 2h, gy, gz)
    rd = asm(rd_prev, rd_cur, rd_next)
    c2 = asm(c2_prev, c2_cur, c2_next)
    upd = rd > 0.0

    nrows = tx + 2 * h
    for _ in range(k):
        neigh = (_zshift(q, 1, 0, nrows) + _zshift(q, -1, 0, nrows)
                 + _zshift(q, 1, 1, gy) + _zshift(q, -1, 1, gy)
                 + _zshift(q, 1, 2, gz) + _zshift(q, -1, 2, gz))
        q = jnp.where(upd, neigh * rd + c2, q)

    out_ref[...] = q[h:h + tx]


def _whole_grid_kernel(q_ref, rd_ref, c2_ref, out_ref, *, iters, shape):
    """All `iters` sweeps in one kernel with the full grid VMEM-resident —
    ONE HBM read of (q, rd, c2) and one write of q for the entire solve,
    vs one per K sweeps for the slab kernel.  VPU-bound; measured 2.83 ms
    vs 3.51 ms (K-slab) per 199-sweep 128^3 solve, bitwise identical."""
    gx, gy, gz = shape
    q = q_ref[...]
    rd = rd_ref[...]
    c2 = c2_ref[...]
    upd = rd > 0.0

    def body(_, q):
        neigh = (_zshift(q, 1, 0, gx) + _zshift(q, -1, 0, gx)
                 + _zshift(q, 1, 1, gy) + _zshift(q, -1, 1, gy)
                 + _zshift(q, 1, 2, gz) + _zshift(q, -1, 2, gz))
        return jnp.where(upd, neigh * rd + c2, q)

    out_ref[...] = jax.lax.fori_loop(0, iters, body, q)


# Whole-grid VMEM residency needs ~6 live grid-sized f32 arrays (q, rd, c2,
# neighbor accumulator, shift temp, update mask); cap the grid so that stays
# comfortably inside v5e's 128 MB VMEM.
_WHOLE_GRID_MAX_CELLS = 128 * 128 * 128


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


def _slab_sizes(gx: int, gy: int, gz: int, k: int, tx: int):
    """Pick (k, tx) fitting the K-sweep working set in VMEM."""
    tx = max(1, min(tx, max(1, 262144 // (gy * gz))))
    if gx % tx != 0:
        tx = next(t for t in range(min(tx, gx), 0, -1) if gx % t == 0)
    return min(k, tx), tx


def _one_pass(q_pad, rd_pad, c2_pad, kk, tx, shape, interpret):
    """One Pallas pass of kk fused sweeps over x-padded (gx + 2*tx) arrays.
    Only the tx pad rows nearest the block are ever read (the kernel reads
    prev[tx-kk:] / next[:kk]), so pads beyond the real halo may be zeros."""
    gx, gy, gz = shape
    kern = functools.partial(_jacobi_kernel, k=kk, tx=tx, shape=shape)
    slab = lambda off: pl.BlockSpec(            # noqa: E731
        (tx, gy, gz), lambda i, o=off: (i + o, 0, 0),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(gx // tx,),
        in_specs=[slab(0), slab(1), slab(2)] * 3,
        out_specs=pl.BlockSpec((tx, gy, gz), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gx, gy, gz), q_pad.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*([q_pad] * 3 + [rd_pad] * 3 + [c2_pad] * 3))


def jacobi_sweeps_pallas(q: jnp.ndarray, rd: jnp.ndarray, c2: jnp.ndarray,
                         n_iters: int,
                         k: int = 8, tx: int = 16,
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
    k, tx = _slab_sizes(gx, gy, gz, k, tx)

    def xpad(a):
        return jnp.pad(a, ((tx, tx), (0, 0), (0, 0)))

    rdp, c2p = xpad(rd), xpad(c2)
    shape = (gx, gy, gz)

    passes_full, rem = divmod(n_iters, k)
    if passes_full:
        def body(_, qq):
            return _one_pass(xpad(qq), rdp, c2p, k, tx, shape, interpret)
        q = jax.lax.fori_loop(0, passes_full, body, q)
    if rem:
        q = _one_pass(xpad(q), rdp, c2p, rem, tx, shape, interpret)
    return q


def jacobi_sweeps_sharded(q: jnp.ndarray, rd: jnp.ndarray, c2: jnp.ndarray,
                          n_iters: int, axis_name: str,
                          k: int = 8, tx: int = 16,
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
    k, tx = _slab_sizes(lx, gy, gz, k, tx)
    n = jax.lax.axis_size(axis_name)
    up = [(j, j + 1) for j in range(n - 1)]      # send +x
    down = [(j + 1, j) for j in range(n - 1)]    # send -x

    def xpad_halo(a):
        """(lx, Y, Z) -> (lx + 2*tx, Y, Z): real k-wide neighbor halos in the
        pad rows adjacent to the block, zeros beyond (never read)."""
        from_left = jax.lax.ppermute(a[lx - k:], axis_name, up)
        from_right = jax.lax.ppermute(a[:k], axis_name, down)
        z = jnp.zeros((tx - k, gy, gz), dtype=a.dtype)
        return jnp.concatenate([z, from_left, a, from_right, z], axis=0)

    rdp, c2p = xpad_halo(rd), xpad_halo(c2)
    shape = (lx, gy, gz)

    passes_full, rem = divmod(n_iters, k)
    if passes_full:
        def body(_, qq):
            return _one_pass(xpad_halo(qq), rdp, c2p, k, tx, shape,
                             interpret)
        q = jax.lax.fori_loop(0, passes_full, body, q)
    if rem:
        q = _one_pass(xpad_halo(q), rdp, c2p, rem, tx, shape, interpret)
    return q
