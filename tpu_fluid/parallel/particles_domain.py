"""Domain-sharded particles: each shard owns the particles inside its x-slab
(flag-gated alternative to index sharding — `FluidConfig.particle_sharding`).

Why: with index-sharded particles, stage 14 must all_gather the velocity
field so any shard can sample anywhere — 3*X*Y*Z*4 B per shard per step
(25 MB at 128^3, 200 MB at 256^3), a collective that grows with grid VOLUME.
With the particles living on the shard that owns their x-slab (the particle
analogue of the reference's spatial decomposition, SURVEY.md §5.7):

  - stage 14 samples from a 1-plane halo-extended LOCAL slab (the packed
    64-lane row of cell j spans x offsets {-1..+1}; ops/packed_sampler.py),
  - the occupancy / histogram scatters are slab-local with NO collective
    (every particle in cell (x, y, z) is owned by the shard owning x),
  - a fixed-capacity ppermute exchange migrates boundary-crossers each step,

so per-step particle communication is two migration buffers + halo planes —
it grows with slab SURFACE, not grid volume.

Static-shape costs (XLA has no dynamic sizes): each shard allocates `slots`
particle slots sized from the ACTUAL initial per-slab census times
`particle_slot_slack` (see domain_slots — init is therefore drop-free by
construction and raises if it ever isn't), and the migration buffers hold
`slots * particle_migrate_frac` per direction.  Overflow at runtime (a slab
accumulating more particles than its slots, or more one-hop crossers than
the buffer) deactivates the excess — bounded-loss semantics, like the
reference dropping particles that escape the box — and every loss is
counted into the on-device `FluidState.dropped` counter (surfaced by
utils/diagnostics.py), never silent.
Particles that move more than one slab per step (CFL violation; cannot
happen with the solid-wall repel field) migrate one hop per step and sample
clamped values until they arrive.

Parity: per-particle position updates are bitwise-identical to the
single-device step (same packed rows, same weights); the particle SET is
preserved but slot ORDER is not — tests compare sorted position sets
bitwise and the grid fields exactly (tests/test_particles_domain.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.core.state import FluidState
from tpu_fluid.parallel.halo import halo_planes
from tpu_fluid.parallel.mesh import AXIS


def domain_slots(cfg: FluidConfig, n: int, census=None) -> int:
    """Particle slots per shard, padded to a lane multiple (128).

    With `census` (per-shard initial particle counts — domain_shard_state
    computes it), slots are sized from the LARGEST slab's census times the
    slack headroom: scenes that concentrate particles in a few slabs (the
    flagship scaled_scene cube spans half the x extent, putting 2x the
    global mean in half the slabs) start with real headroom instead of a
    silent capacity cliff.  Without a census: the global-mean floor
    particle_count/n * slack."""
    base = -(-cfg.particle_count // n)
    peak = base if census is None else max(1, int(np.max(census)))
    slots = max(peak, int(np.ceil(peak * cfg.particle_slot_slack)))
    return -(-slots // 128) * 128


def migrate_capacity(slots: int, cfg: FluidConfig) -> int:
    """Per-direction migration-buffer rows for a shard holding `slots`
    particle slots (the step derives it from the state's actual local slot
    count, so census-sized states get proportionally sized buffers)."""
    return max(128, -(-int(slots * cfg.particle_migrate_frac) // 128) * 128)


def domain_shard_state(state: FluidState, mesh, cfg: FluidConfig
                       ) -> FluidState:
    """Repack an (unsharded) state's particles into per-shard slot segments
    by owning x-slab and place everything on the mesh.  positions/active
    change shape to (n * slots, 3) / (n * slots,)."""
    from tpu_fluid.parallel.mesh import state_shardings

    n = int(mesh.devices.size)
    gx = cfg.grid_size[0]
    if gx % n:
        raise ValueError(f"grid x size {gx} must divide the mesh ({n})")
    lx = gx // n
    pos = np.asarray(jax.device_get(state.positions))
    act = np.asarray(jax.device_get(state.active))
    owner = np.clip(np.floor(pos[:, 0]).astype(np.int64), 0, gx - 1) // lx
    census = np.bincount(owner[act], minlength=n)
    slots = domain_slots(cfg, n, census)
    new_pos = np.zeros((n * slots, 3), dtype=pos.dtype)
    new_act = np.zeros((n * slots,), dtype=bool)
    for i in range(n):
        src = np.nonzero(act & (owner == i))[0]
        if len(src) > slots:
            # unreachable with census-based sizing (slots >= census.max());
            # kept as a hard error — a drop-at-init must never be silent
            # (the reference's init activates exactly the cube,
            # 00_init_particles/init_particles.comp:36-49)
            raise ValueError(
                f"domain_shard_state: shard {i} holds {len(src)} particles "
                f"but only {slots} slots were sized")
        new_pos[i * slots:i * slots + len(src)] = pos[src]
        new_act[i * slots:i * slots + len(src)] = True
    state = state._replace(positions=jnp.asarray(new_pos),
                           active=jnp.asarray(new_act))
    return jax.device_put(state, state_shardings(mesh))


# ----------------------------------------------------------------- sampling
def _edge_replicated_halo(a: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """halo_extend(a, 1) with the DOMAIN-END planes edge-replicated instead
    of zero: the velocity sampler's clamp-to-edge contract
    (fluid_flow_sections.h:94-95) reads the edge plane for out-of-domain
    texels, which `ops/packed_sampler._edge_shift` reproduces on a full grid
    and this reproduces at slab ends."""
    left, right = halo_planes(a, 1, axis_name)
    ax = a.ndim - 3
    i = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    first = jax.lax.slice_in_dim(a, 0, 1, axis=ax)
    last = jax.lax.slice_in_dim(a, a.shape[ax] - 1, a.shape[ax], axis=ax)
    left = jnp.where(i == 0, first, left)
    right = jnp.where(i == n - 1, last, right)
    return jnp.concatenate([left, a, right], axis=ax)


def move_particles_local(vel_local: jnp.ndarray, positions: jnp.ndarray,
                         active: jnp.ndarray, cfg: FluidConfig, x0,
                         use_pallas: bool, interpret: bool) -> jnp.ndarray:
    """Stage 14 on a local x-slab: build the packed table over the 1-plane
    halo-extended local velocity and gather rows with slab-local x indices.
    Positions stay GLOBAL (the weight math and clamps use cfg.grid_size), so
    per-particle results are bitwise-identical to the single-device path."""
    gx, gy, gz = cfg.grid_size
    lx = vel_local.shape[1]
    vel_e = _edge_replicated_halo(vel_local, AXIS)      # (3, lx+2, Y, Z)

    j = jnp.clip(jnp.floor(positions).astype(jnp.int32), 0,
                 jnp.array([gx - 1, gy - 1, gz - 1], dtype=jnp.int32))
    jx = jnp.clip(j[:, 0] - x0 + 1, 0, lx + 1)   # extended-slab x row
    flat = jx * (gy * gz) + j[:, 1] * gz + j[:, 2]

    if use_pallas:
        from tpu_fluid.kernels.pack_table import build_packed_table_pallas
        from tpu_fluid.kernels.particle_sample import sample_and_move
        table = build_packed_table_pallas(vel_e, interpret=interpret)
        rows = jnp.take(table, flat, axis=0, mode="clip")
        new_t = sample_and_move(rows, positions.T, active, cfg.grid_size,
                                cfg.dt, interpret=interpret)
        return new_t.T
    from tpu_fluid.ops.packed_sampler import (apply_packed_rows,
                                              build_packed_table)
    table = build_packed_table(vel_e)
    rows = jnp.take(table, flat, axis=0, mode="clip")
    v = apply_packed_rows(rows, cfg.grid_size, positions)
    return jnp.where(active[:, None], positions + v * cfg.dt, positions)


# ---------------------------------------------------------------- migration
def migrate(positions: jnp.ndarray, active: jnp.ndarray, x0, lx: int,
            m: int, axis_name: str = AXIS):
    """One-hop particle exchange after the move: active slots whose cell x
    left [x0, x0 + lx) are packed into fixed-capacity (m, 3) buffers,
    ppermuted to the x-neighbor shards, and scattered into this shard's free
    slots.  Returns (positions, active, n_dropped).

    Overflow semantics (all static-shape): crossers beyond m per direction,
    and arrivals beyond the free slots, are deactivated (dropped) — and
    COUNTED: `n_dropped` is this shard's (leavers - placements) balance, so
    `psum(n_dropped)` over the mesh is exactly the global particle loss of
    this exchange, covering all three bounded-loss paths (send-buffer
    overflow, receive-slot exhaustion, and a crosser leaving past a domain
    end, which cannot occur with solid walls)."""
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        # a full-domain slab has no neighbor to exchange with; keeping the
        # particles (even box-escapees) exactly matches the single-device
        # step, which never deactivates them (stages/particles.py — the
        # occupancy scatter just drops out-of-box indices).  Also dodges
        # the degenerate empty-pair ppermutes, 59 + 35 ms EACH for the
        # migration buffers on real silicon (round-5 NOTES, SPMD trace).
        return positions, active, jnp.int32(0)
    cap = positions.shape[0]
    cx = jnp.floor(positions[:, 0]).astype(jnp.int32)
    go_l = active & (cx < x0)
    go_r = active & (cx >= x0 + lx)
    keep = active & ~go_l & ~go_r

    # ONE stable category sort replaces the three nonzero(size=...)
    # compactions this function used to run (go_l pack, go_r pack, hole
    # scan): each nonzero measured 3.37 ms at the v5e-8 per-shard shapes
    # vs ~0.5 ms for the whole sort (round-5 probes, NOTES "migrate's
    # per-shard machinery").  Stable order keeps every segment in slot-
    # index order, exactly what nonzero produced:
    #   order = [go_l ids | go_r ids | inactive ids | kept ids]
    cat = jnp.where(go_l, 0, jnp.where(go_r, 1, jnp.where(keep, 3, 2)))
    order = jnp.argsort(cat, stable=True).astype(jnp.int32)
    n_l = jnp.sum(go_l)
    n_r = jnp.sum(go_r)
    # pad by m sentinels so the go_r slice below NEVER hits dynamic_slice's
    # start clamp (with m == cap a clamped start would alias the go_l
    # segment); sentinel rows are masked by the validity flags
    order_ext = jnp.concatenate(
        [order, jnp.full((m,), cap - 1, jnp.int32)])

    def pack(start, count):
        # first m ids of this segment, in slot order (stable sort)
        ids = jax.lax.dynamic_slice_in_dim(order_ext, start, m)
        # int32 validity flags: collective-permute of pred arrays is not
        # portable across backends
        valid = (jnp.arange(m) < count).astype(jnp.int32)
        # rows beyond `count` hold other particles' positions; every
        # consumer masks by the validity flag, so no fill is needed
        rows = jnp.take(positions, ids, axis=0, mode="clip")
        return rows, valid

    snd_l, val_l = pack(jnp.int32(0), n_l)
    snd_r, val_r = pack(n_l, n_r)
    up = [(j, j + 1) for j in range(n - 1)]      # toward +x
    down = [(j + 1, j) for j in range(n - 1)]    # toward -x
    in_l_pos = jax.lax.ppermute(snd_r, axis_name, up)    # from the -x shard
    in_l_val = jax.lax.ppermute(val_r, axis_name, up)
    in_r_pos = jax.lax.ppermute(snd_l, axis_name, down)  # from the +x shard
    in_r_val = jax.lax.ppermute(val_l, axis_name, down)
    in_pos = jnp.concatenate([in_l_pos, in_r_pos])
    in_val = jnp.concatenate([in_l_val, in_r_val])

    # place the k-th valid arrival into the k-th free slot.  Holes are the
    # leading `n_holes` entries of the category sort (go_l + go_r +
    # inactive, each segment in slot order); entries past n_holes are kept
    # slots, but the `ok` guard below never addresses them.  (The hole
    # ORDER differs from the old index-ordered nonzero scan — slot order
    # is explicitly outside the parity contract, docstring above.)
    holes = order[:2 * m]
    n_holes = jnp.sum(~keep)
    rank = jnp.cumsum(in_val) - 1
    ok = (in_val > 0) & (rank < n_holes) & (rank < 2 * m)
    tgt = jnp.where(ok, jnp.take(holes, jnp.clip(rank, 0, 2 * m - 1)), cap)
    # three scalar-column scatters instead of one (m, 3) row scatter: the
    # XLA:TPU row-scatter emitter measured 7.42 ms vs 2.78 ms for the
    # column form at the v5e-8 per-shard shapes (cap 375k / m 94k —
    # round-5 probes `mig_scatter` / `mig_scatter_cols`); the rebuilt
    # (cap, 3) stack is a ~4.5 MB write, noise by comparison
    positions = jnp.stack(
        [positions[:, c].at[tgt].set(in_pos[:, c], mode="drop")
         for c in range(3)], axis=1)
    active = keep.at[tgt].set(True, mode="drop")
    leavers = jnp.sum(go_l) + jnp.sum(go_r)
    placed = jnp.sum(ok.astype(jnp.int32))
    return positions, active, (leavers - placed).astype(jnp.int32)


# ----------------------------------------------------------------- scatters
def detailed_occupancy_local(positions: jnp.ndarray, active: jnp.ndarray,
                             cfg: FluidConfig, x0_det, lx_det: int
                             ) -> jnp.ndarray:
    """stages/particles.detailed_occupancy onto this shard's detailed x-slab
    (the domain invariant makes every owned particle's detailed cell local;
    stragglers outside the slab are simply not scattered)."""
    dy, dz = cfg.detailed_size[1], cfg.detailed_size[2]
    p = positions * float(cfg.surface_render_resolution)
    idx = jnp.trunc(p).astype(jnp.int32)
    x = idx[:, 0] - x0_det
    y, z = idx[:, 1], idx[:, 2]
    inb = ((x >= 0) & (x < lx_det) & (y >= 0) & (y < dy)
           & (z >= 0) & (z < dz) & active)
    flat = jnp.where(inb, x * (dy * dz) + y * dz + z, lx_det * dy * dz)
    occ = jnp.zeros((lx_det * dy * dz,), dtype=jnp.int32)
    # unique_indices: safe for a constant-1 set, skips XLA's dedup sort
    occ = occ.at[flat].set(1, mode="drop", unique_indices=True)
    return occ.reshape(lx_det, dy, dz).astype(jnp.uint8)


def cell_histogram_local(positions: jnp.ndarray, active: jnp.ndarray,
                         grid_size, x0, lx: int) -> jnp.ndarray:
    """ops/scatter.particle_cell_histogram restricted to this shard's sim
    x-slab — exact global slab counts under the domain invariant, with no
    collective."""
    gy, gz = grid_size[1], grid_size[2]
    idx = jnp.trunc(positions).astype(jnp.int32)
    x = idx[:, 0] - x0
    y, z = idx[:, 1], idx[:, 2]
    inb = ((x >= 0) & (x < lx) & (y >= 0) & (y < gy)
           & (z >= 0) & (z < gz) & active)
    flat = jnp.where(inb, x * (gy * gz) + y * gz + z, 0)
    counts = jnp.zeros((lx * gy * gz,), dtype=jnp.int32)
    counts = counts.at[flat].add(inb.astype(jnp.int32))
    return counts.reshape(lx, gy, gz)
