"""Per-piece roofline probes on the real TPU (VERDICT round-4 item 1).

For each non-request piece of the 128^3 bench step this measures (a) the
production kernel and (b) a same-shape synthetic CEILING kernel — identical
pallas grid / block specs / HBM traffic, trivial compute — so the gap
between the two is exactly the kernel's arithmetic + data-movement cost on
top of its unavoidable IO.  NOTES.md "Round-5 roofline" records the table.

Timing: each probe is ONE jitted program that applies the kernel `iters`
times inside lax.scan, with a scalar of each output folded into the carry
(defeats CSE/DCE without adding measurable work), so per-call time needs no
host-dispatch correction and one sync per probe keeps the axon tunnel's
un-synced dispatch depth at 1 (NOTES round-3: >~10 hangs).

Usage: python tools/roofline.py [probe ...]   (default: all)
Probes: pack pack_io pack_stacklast surface1d surface2d surface_io
        sample jacobi64 jacobi128 mask misc
"""

from __future__ import annotations

import functools
import json
import sys
import time

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.utils.cache import enable_compilation_cache

N = 128
CFG = None  # set in main()


def timed_scan(make_step, carry0, iters=30, reps=3):
    """make_step: carry -> carry (one kernel application).  Returns ms per
    application via the TWO-LENGTH DIFFERENCE (time(4L) - time(L)) / 3L —
    cancels the constant dispatch + fetch-roundtrip overhead (~30-40 ms on
    this tunnel) that would otherwise swamp ms-scale kernels.  Inputs are
    perturbed per rep: this remote runtime serves repeated identical-input
    executions from a result cache (utils/profiling.py header), which an
    un-perturbed rep measures as ~0 ms."""
    def build(length):
        @jax.jit
        def prog(c):
            return jax.lax.scan(lambda cc, _: (make_step(cc), None), c,
                                None, length=length)[0]
        return prog

    def fetch(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[:1]))

    def run_ms(prog, rep):
        cin = jax.tree_util.tree_map(
            lambda a: a + jnp.asarray(rep, a.dtype), carry0)
        fetch(cin)                    # upload outside the timed region
        t0 = time.time()
        fetch(prog(cin))
        return (time.time() - t0) * 1e3

    short, long_ = build(iters), build(4 * iters)
    run_ms(short, 100)                # compile + warm both programs
    run_ms(long_, 101)
    best = None
    for r in range(reps):
        per = (run_ms(long_, 2 * r + 1) - run_ms(short, 2 * r + 2)) \
            / (3 * iters)
        best = per if best is None else min(best, per)
    return best


def fold(carry, out):
    """Fold a scalar of `out` into the f32 carry (anti-CSE, ~zero cost)."""
    leaves = jax.tree_util.tree_leaves(out)
    s = sum(l.ravel()[0].astype(jnp.float32) for l in leaves)
    return carry + s * 1e-30


# ---------------------------------------------------------------- pack


def _vel():
    return jnp.zeros((3, N, N, N), jnp.float32) + jnp.linspace(
        0.0, 1.0, N)  # nonzero, varied


def probe_pack():
    from tpu_fluid.kernels.pack_table import build_packed_table_pallas2
    vel = _vel()

    def step(v):
        return fold(v, build_packed_table_pallas2(v))
    return timed_scan(step, vel)


def _pack_io_kernel(prev_ref, cur_ref, next_ref, out_ref, *, shape):
    gy, gz = shape[1], shape[2]
    s = prev_ref[0, 0, 0, 0] + cur_ref[0, 0, 0, 0] + next_ref[0, 0, 0, 0]
    out_ref[0] = jnp.zeros((gy, gz // 2, 128), jnp.float32) + s


def probe_pack_io():
    """Ceiling: same grid, same 3x halo-row input reads, same full-table
    write — but the out block is a scalar broadcast (no stack/transpose)."""
    from tpu_fluid.kernels.pack_table import _xrow_specs, LANES
    vel = _vel()
    gx, gy, gz = N, N, N
    kern = functools.partial(_pack_io_kernel, shape=(gx, gy, gz))

    def build(v):
        return pl.pallas_call(
            kern, grid=(gx,), in_specs=list(_xrow_specs(gx, gy, gz)),
            out_specs=pl.BlockSpec((1, gy, gz // 2, 2 * LANES),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((gx, gy, gz // 2, 2 * LANES),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(v, v, v)

    def step(v):
        return fold(v, build(v))
    return timed_scan(step, vel)


def _pack_stacklast_kernel(prev_ref, cur_ref, next_ref, out_ref, *, shape):
    """Variant: build (Y, Z, 64) by stacking on a NEW MINOR axis directly
    (no explicit transpose) — probes whether Mosaic lowers the lane
    interleave better than stack(axis=0) + transpose."""
    from tpu_fluid.ops.packed_sampler import LANES, _OTHER, _lane
    gx, gy, gz = shape
    a = jnp.concatenate([prev_ref[...], cur_ref[...], next_ref[...]],
                        axis=1)
    a = jnp.concatenate([a[:, :, :1], a, a[:, :, -1:]], axis=2)
    a = jnp.concatenate([a[..., :1], a, a[..., -1:]], axis=3)
    lane_vals = {}
    for c in range(3):
        a1, a2 = _OTHER[c]
        for dc in (0, 1):
            for d1 in (-1, 0, 1):
                for d2 in (-1, 0, 1):
                    off = [0, 0, 0]
                    off[c] = dc
                    off[a1] = d1
                    off[a2] = d2
                    lane_vals[_lane(c, dc, d1, d2)] = a[
                        c, 1 + off[0],
                        1 + off[1]:1 + off[1] + gy,
                        1 + off[2]:1 + off[2] + gz]
    zero = jnp.zeros((gy, gz), dtype=out_ref.dtype)
    t = jnp.stack([lane_vals.get(ln, zero) for ln in range(LANES)],
                  axis=-1)                        # (Y, Z, 64) directly
    h = gz // 2
    out_ref[0] = jnp.concatenate([t[:, :h, :], t[:, h:, :]], axis=-1)


def probe_pack_stacklast():
    from tpu_fluid.kernels.pack_table import _xrow_specs, LANES
    vel = _vel()
    gx, gy, gz = N, N, N
    kern = functools.partial(_pack_stacklast_kernel, shape=(gx, gy, gz))

    def build(v):
        return pl.pallas_call(
            kern, grid=(gx,), in_specs=list(_xrow_specs(gx, gy, gz)),
            out_specs=pl.BlockSpec((1, gy, gz // 2, 2 * LANES),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((gx, gy, gz // 2, 2 * LANES),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(v, v, v)

    def step(v):
        return fold(v, build(v))
    return timed_scan(step, vel)


def _pack_t128_kernel(prev_ref, cur_ref, next_ref, out_ref, *, shape):
    """Variant: fuse the z-halves pairing INTO the transpose — stack both
    halves to (128, Y, Z/2) first, then ONE (1,2,0) transpose straight into
    full 128-lane vregs.  The production kernel transposes into 64-lane
    (half-empty) vregs and pays a second lane-concat relayout pass."""
    from tpu_fluid.ops.packed_sampler import LANES, _OTHER, _lane
    gx, gy, gz = shape
    a = jnp.concatenate([prev_ref[...], cur_ref[...], next_ref[...]],
                        axis=1)
    a = jnp.concatenate([a[:, :, :1], a, a[:, :, -1:]], axis=2)
    a = jnp.concatenate([a[..., :1], a, a[..., -1:]], axis=3)
    lane_vals = {}
    for c in range(3):
        a1, a2 = _OTHER[c]
        for dc in (0, 1):
            for d1 in (-1, 0, 1):
                for d2 in (-1, 0, 1):
                    off = [0, 0, 0]
                    off[c] = dc
                    off[a1] = d1
                    off[a2] = d2
                    lane_vals[_lane(c, dc, d1, d2)] = a[
                        c, 1 + off[0],
                        1 + off[1]:1 + off[1] + gy,
                        1 + off[2]:1 + off[2] + gz]
    zero = jnp.zeros((gy, gz), dtype=out_ref.dtype)
    h = gz // 2
    planes = [lane_vals.get(ln, zero) for ln in range(LANES)]
    both = jnp.stack([p[:, :h] for p in planes]
                     + [p[:, h:] for p in planes], axis=0)  # (128, Y, Z/2)
    out_ref[0] = jnp.transpose(both, (1, 2, 0))             # (Y, Z/2, 128)


def probe_pack_t128():
    from tpu_fluid.kernels.pack_table import _xrow_specs, LANES
    vel = _vel()
    gx, gy, gz = N, N, N
    kern = functools.partial(_pack_t128_kernel, shape=(gx, gy, gz))

    def build(v):
        return pl.pallas_call(
            kern, grid=(gx,), in_specs=list(_xrow_specs(gx, gy, gz)),
            out_specs=pl.BlockSpec((1, gy, gz // 2, 2 * LANES),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((gx, gy, gz // 2, 2 * LANES),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(v, v, v)

    def step(v):
        return fold(v, build(v))
    return timed_scan(step, vel)


def _pack_tonly_kernel(prev_ref, cur_ref, next_ref, out_ref, *, shape):
    """Transpose-only: same IO + the same (128, Y, Z/2) -> (Y, Z/2, 128)
    relayout, but trivial assembly (one row broadcast) — isolates the
    mandatory z-minor -> neighbor-minor relayout cost from the 54-slice
    neighborhood assembly."""
    gy, gz = shape[1], shape[2]
    v = (prev_ref[0, 0] + cur_ref[0, 0] + next_ref[0, 0])[:, :gz // 2]
    both = jnp.broadcast_to(v[None], (128, gy, gz // 2))
    out_ref[0] = jnp.transpose(both, (1, 2, 0))


def probe_pack_tonly():
    from tpu_fluid.kernels.pack_table import _xrow_specs, LANES
    vel = _vel()
    gx, gy, gz = N, N, N
    kern = functools.partial(_pack_tonly_kernel, shape=(gx, gy, gz))

    def build(v):
        return pl.pallas_call(
            kern, grid=(gx,), in_specs=list(_xrow_specs(gx, gy, gz)),
            out_specs=pl.BlockSpec((1, gy, gz // 2, 2 * LANES),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((gx, gy, gz // 2, 2 * LANES),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(v, v, v)

    def step(v):
        return fold(v, build(v))
    return timed_scan(step, vel)


# ------------------------------------------------------------- surface


def _surface_args():
    d = N * CFG.surface_render_resolution
    occ = (jnp.zeros((d, d, d), jnp.uint8)
           .at[d // 4:d // 2].set(1))
    inertia = jnp.zeros((d, d, d), jnp.uint8).at[d // 4:d // 2].set(40)
    f2 = jnp.zeros((d, d, d), jnp.float32) - 1.0
    skip = jnp.zeros((d, d, d), jnp.uint8)
    kw = dict(steps=CFG.float_density_diffuse_steps,
              k=CFG.float_density_diffuse_coefficient,
              inc_filled=CFG.inertia_increase_filled,
              inc_neigh=CFG.inertia_increase_neighbour,
              required_hits=CFG.inertia_required_neighbour_hits,
              dec=CFG.inertia_decrease,
              max_inertia=CFG.max_inertia,
              div_coef=CFG.float_density_division_coefficient)
    return occ, inertia, f2, skip, kw


def probe_surface1d():
    from tpu_fluid.kernels.surface_fused import surface_fused_auto
    occ, inertia, f2, skip, kw = _surface_args()

    def step(f):
        return fold(f, surface_fused_auto(occ, inertia, f, skip, **kw))
    return timed_scan(step, f2, iters=15)


def probe_surface2d():
    from tpu_fluid.kernels.surface_fused import surface_fused_2d
    occ, inertia, f2, skip, kw = _surface_args()

    def step(f):
        return fold(f, surface_fused_2d(occ, inertia, f, skip, **kw))
    return timed_scan(step, f2, iters=15)


def _surface_io_kernel(occ_ref, in_ref, f2_ref, skip_ref,
                       oi_ref, of1_ref, of2_ref):
    # whole-block single-op bodies: reads all 4 inputs, writes all 3
    # outputs, ~zero arithmetic.  u8 arithmetic follows the production
    # kernel's pattern (i32 compute, u8 store): Mosaic rejects u8 vector
    # adds, u8 scalar extracts, and u8<->f32 casts.
    oi_ref[...] = (occ_ref[...].astype(jnp.int32)
                   + in_ref[...].astype(jnp.int32)).astype(jnp.uint8)
    skipf = skip_ref[...].astype(jnp.int32).astype(jnp.float32)
    of1_ref[...] = f2_ref[...] + skipf
    of2_ref[...] = f2_ref[...] - skipf


def probe_surface_io():
    """Ceiling: one halo-free read of the 4 inputs + one write of the 3
    outputs over the same x-slab grid (the fused kernel's irreducible HBM
    traffic, minus the (tx+2h)/tx halo amplification)."""
    occ, inertia, f2, skip, kw = _surface_args()
    d = occ.shape[0]
    tx = 16
    V = pltpu.VMEM
    spec = pl.BlockSpec((tx, d, d), lambda i: (i, 0, 0), memory_space=V)

    def build(f):
        return pl.pallas_call(
            _surface_io_kernel, grid=(d // tx,),
            in_specs=[spec] * 4, out_specs=(spec, spec, spec),
            out_shape=(jax.ShapeDtypeStruct((d, d, d), jnp.uint8),
                       jax.ShapeDtypeStruct((d, d, d), jnp.float32),
                       jax.ShapeDtypeStruct((d, d, d), jnp.float32)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(occ, inertia, f, skip)

    def step(f):
        return fold(f, build(f))
    return timed_scan(step, f2, iters=15)


# ------------------------------------------------------------- sample


def probe_sample():
    """The sample+move kernel alone, on pre-gathered (P, 128) paired rows
    (the gather itself is part of the request floor, not this piece)."""
    from tpu_fluid.kernels.particle_sample import sample_and_move
    m = CFG.particle_count
    rows = jnp.zeros((m, 128), jnp.float32) + 0.25
    act = jnp.ones((m,), jnp.float32)
    pos_t = jnp.stack([jnp.linspace(1.0, N - 2.0, m)] * 3, axis=0)

    def step(p):
        # clip keeps the carried positions in-grid across scan iterations
        out = sample_and_move(rows, p, act, (N, N, N), CFG.dt)
        return jnp.clip(out, 1.0, N - 2.0)
    return timed_scan(step, pos_t, iters=20)


# ------------------------------------------------------------- jacobi


def _jacobi_args(n):
    cfg = FluidConfig.scaled_scene(n, jacobi_iters=200)
    q = jnp.zeros((n, n, n), jnp.float32)
    rd = jnp.full((n, n, n), 6, jnp.uint8).at[0].set(0)
    c2 = jnp.zeros((n, n, n), jnp.float32) + 0.1
    return cfg, q, rd, c2


def probe_jacobi(n):
    from tpu_fluid.kernels.jacobi import jacobi_sweeps_pallas
    cfg, q, rd, c2 = _jacobi_args(n)
    iters = cfg.jacobi_iters

    def step(qq):
        return jacobi_sweeps_pallas(qq, rd, c2, iters)
    # small grids: more scan repetitions so the two-length difference
    # window (3*scan_iters solves) is well above timer noise
    scan_iters = 100 if n <= 64 else 5
    ms = timed_scan(step, q, iters=scan_iters, reps=3)
    print(f"jacobi{n}: {ms:.3f} ms / {iters}-iter solve = "
          f"{ms / iters * 1e3:.2f} us/iteration", file=sys.stderr)
    return ms / iters  # ms per Jacobi iteration


def probe_scatter256(dtype):
    """Occupancy scatter-set at the 256^3 bench shape (2M particles into
    the 512^3 detailed grid), i32 vs u8 target (VERDICT r4 #4: the round-2
    'int32 beats uint8' measurement predates the u8 residency work)."""
    d = 512
    m = 2_000_000
    flat = (jnp.arange(m, dtype=jnp.int32) * 67) % (d * d * d)

    def step(c):
        occ = jnp.zeros((d * d * d,), dtype=dtype)
        occ = occ.at[flat + c[0].astype(jnp.int32)].set(
            jnp.asarray(1, dtype), mode="drop", unique_indices=True)
        return c + occ[0].astype(jnp.float32) * 1e-30
    return timed_scan(step, jnp.zeros((1,), jnp.float32), iters=5)


def probe_migrate_shard():
    """migrate()'s per-shard arithmetic at the v5e-8 flagship shapes
    (census peak ~250k x slack 1.5 = ~375k slots, m = slots/4): the two
    pack() compactions (nonzero + take) and the cumsum-ranked placement
    scatter, on silicon — the last unknown in the NOTES v5e-8 projection
    (the ppermute itself is a ~1 MB ICI neighbor send, negligible)."""
    cap = 375_040
    m = 93_952
    pos = jnp.zeros((cap, 3), jnp.float32) + jnp.linspace(0., 16., cap)[:, None]
    active = (jnp.arange(cap) % 4) != 3

    def step(p):
        cx = jnp.floor(p[:, 0]).astype(jnp.int32)
        go_l = active & (cx < 2)
        go_r = active & (cx >= 14)
        keep = active & ~go_l & ~go_r

        def pack(mask):
            ids, = jnp.nonzero(mask, size=m, fill_value=cap)
            valid = (jnp.arange(m) < jnp.sum(mask)).astype(jnp.int32)
            rows = jnp.take(p, ids, axis=0, mode="fill", fill_value=0.0)
            return rows, valid

        snd_l, val_l = pack(go_l)
        snd_r, val_r = pack(go_r)
        in_pos = jnp.concatenate([snd_l, snd_r])
        in_val = jnp.concatenate([val_l, val_r])
        holes, = jnp.nonzero(~keep, size=2 * m, fill_value=cap)
        n_holes = jnp.sum(~keep)
        rank = jnp.cumsum(in_val) - 1
        ok = (in_val > 0) & (rank < n_holes) & (rank < 2 * m)
        tgt = jnp.where(ok, jnp.take(holes, jnp.clip(rank, 0, 2 * m - 1)),
                        cap)
        out = p.at[tgt].set(in_pos, mode="drop")
        return out + 1e-6  # perturb so scan iterations differ
    return timed_scan(step, pos, iters=10)


def probe_migrate_shard2():
    """The ROUND-5 REWRITTEN migrate arithmetic at the same shapes: one
    stable category sort + two dynamic-slice packs + column scatters
    (mirrors parallel/particles_domain.migrate post-rewrite, minus the
    ppermute)."""
    cap, m = 375_040, 93_952
    pos = jnp.zeros((cap, 3), jnp.float32) + jnp.linspace(
        0., 16., cap)[:, None]
    active = (jnp.arange(cap) % 4) != 3

    def step(p):
        cx = jnp.floor(p[:, 0]).astype(jnp.int32)
        go_l = active & (cx < 2)
        go_r = active & (cx >= 14)
        keep = active & ~go_l & ~go_r
        cat = jnp.where(go_l, 0, jnp.where(go_r, 1, jnp.where(keep, 3, 2)))
        order = jnp.argsort(cat, stable=True).astype(jnp.int32)
        n_l = jnp.sum(go_l)
        n_r = jnp.sum(go_r)
        order_ext = jnp.concatenate(
            [order, jnp.full((m,), cap - 1, jnp.int32)])

        def pack(start, count):
            ids = jax.lax.dynamic_slice_in_dim(order_ext, start, m)
            valid = (jnp.arange(m) < count).astype(jnp.int32)
            rows = jnp.take(p, ids, axis=0, mode="clip")
            return rows, valid

        snd_l, val_l = pack(jnp.int32(0), n_l)
        snd_r, val_r = pack(n_l, n_r)
        in_pos = jnp.concatenate([snd_l, snd_r])
        in_val = jnp.concatenate([val_l, val_r])
        holes = order[:2 * m]
        n_holes = jnp.sum(~keep)
        rank = jnp.cumsum(in_val) - 1
        ok = (in_val > 0) & (rank < n_holes) & (rank < 2 * m)
        tgt = jnp.where(ok, jnp.take(holes, jnp.clip(rank, 0, 2 * m - 1)),
                        cap)
        out = jnp.stack(
            [p[:, c].at[tgt].set(in_pos[:, c], mode="drop")
             for c in range(3)], axis=1)
        return out + 1e-6
    return timed_scan(step, pos, iters=10)


def _migrate_piece(which):
    cap, m = 375_040, 93_952
    pos = jnp.zeros((cap, 3), jnp.float32) + jnp.linspace(
        0., 16., cap)[:, None]
    active = (jnp.arange(cap) % 4) != 3
    ids0 = jnp.arange(m, dtype=jnp.int32) * 3 % cap
    tgt0 = (jnp.arange(2 * m, dtype=jnp.int32) * 7) % cap
    rows2 = jnp.zeros((2 * m, 3), jnp.float32) + 0.5

    if which == "nonzero":
        def step(p):
            mask = active & (jnp.floor(p[:, 0]).astype(jnp.int32) < 2)
            ids, = jnp.nonzero(mask, size=m, fill_value=cap)
            return p + ids[0].astype(jnp.float32) * 1e-30
    elif which == "take":
        def step(p):
            rows = jnp.take(p, ids0, axis=0, mode="fill", fill_value=0.0)
            return p + rows[0, 0] * 1e-30
    elif which == "scatter":
        def step(p):
            return p.at[tgt0].set(rows2, mode="drop") + 1e-7
    elif which == "scatter_cols":
        # same placement as 3 scalar-column scatters (the 1M occupancy
        # scatter prices scalar requests at ~5.9 ns vs the row form's
        # ~13 ns/element)
        def step(p):
            cols = [p[:, c].at[tgt0].set(rows2[:, c], mode="drop")
                    for c in range(3)]
            return jnp.stack(cols, axis=1) + 1e-7
    return timed_scan(step, pos, iters=10)


def probe_mask():
    """solid_parent_mask + u8 cast (rebuilt every step; part of 'misc')."""
    from tpu_fluid.stages.surface_fields import solid_parent_mask
    types = jnp.zeros((N, N, N), jnp.int32)

    def step(t):
        m = solid_parent_mask(t, CFG).astype(jnp.uint8)
        return t + m[0, 0, 0].astype(jnp.int32) * 0
    return timed_scan(step, types, iters=20)


PROBES = {
    "pack": probe_pack,
    "pack_io": probe_pack_io,
    "pack_stacklast": probe_pack_stacklast,   # dead: Mosaic "Unsupported
    # reshape" on the stack(axis=-1) lowering (round-5 probe log)
    "pack_t128": probe_pack_t128,
    "pack_tonly": probe_pack_tonly,
    "surface1d": probe_surface1d,
    "surface2d": probe_surface2d,
    "surface_io": probe_surface_io,
    "sample": probe_sample,
    "jacobi64": lambda: probe_jacobi(64),
    "jacobi128": lambda: probe_jacobi(128),
    "mask": probe_mask,
    "scat256_i32": lambda: probe_scatter256(jnp.int32),
    "scat256_u8": lambda: probe_scatter256(jnp.uint8),
    "migrate_shard": probe_migrate_shard,
    "migrate_shard2": probe_migrate_shard2,
    "mig_nonzero": lambda: _migrate_piece("nonzero"),
    "mig_take": lambda: _migrate_piece("take"),
    "mig_scatter": lambda: _migrate_piece("scatter"),
    "mig_scatter_cols": lambda: _migrate_piece("scatter_cols"),
}


def main():
    global CFG
    enable_compilation_cache()
    CFG = FluidConfig.scaled_scene(N, particle_count=1000000,
                                   jacobi_iters=200)
    names = sys.argv[1:] or list(PROBES)
    out = {}
    for name in names:
        try:
            ms = PROBES[name]()
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}",
                  file=sys.stderr)
            continue
        out[name] = round(ms, 4)
        print(json.dumps({"probe": name, "ms": round(ms, 4)}))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
