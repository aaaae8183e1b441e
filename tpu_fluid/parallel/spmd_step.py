"""Explicit SPMD simulation step: the full 19-stage pipeline under
`jax.shard_map` with hand-written ppermute halo exchange over ICI.

Why this exists alongside the GSPMD path (parallel/sharded.py): GSPMD lets
XLA derive the collectives for the *XLA* formulations of every stage, but it
cannot partition `pl.pallas_call` — on >1 device the Pallas fast path
(K-fused Jacobi, fused advect, packed particle sampling) would be undefined
territory.  Here each stage runs on its local x-slab block with explicit
halo exchange, so the exact single-chip Pallas kernels run unchanged on the
local blocks — the TPU-native equivalent of the reference's single-GPU
dispatch list (`fluid_flow_sections.h:159-391`), decomposed over a mesh.

Communication per step (n shards, grid (X,Y,Z), detailed (DX,DY,DZ)):
  - radius-1 stencil stages: one 1-plane ppermute pair each (~Y*Z*4 B)
  - Jacobi: one K-plane ppermute pair per K-fused Pallas pass
    (ceil(iters/K) passes) — the dominant pattern at scale (SURVEY.md §5.7)
  - particles: all_gather of the velocity field (3*X*Y*Z*4 B) so the
    index-sharded particle shard can sample anywhere, then a
    psum_scatter of the detailed occupancy histogram (DX*DY*DZ B); the
    request-bound scatter/gather work — the single-chip bottleneck —
    divides by n.

tests/test_spmd_step.py pins this step against the single-device step on an
8-way CPU mesh, both through the XLA stage formulations (pallas_mode="off")
and through the real Pallas kernels (pallas_mode="interpret").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.core.state import FluidState
from tpu_fluid.core.types import CellType
from tpu_fluid.ops.stencil import MOVES, shifted
from tpu_fluid.parallel.halo import halo_extend, halo_inner, halo_planes
from tpu_fluid.parallel.mesh import AXIS, state_pspecs
from tpu_fluid.stages import celltypes, particles, pressure, surface_fields
from tpu_fluid.stages import velocity as vstages


# --------------------------------------------------------------- cell types
def _solid_mask_spmd(local_shape, cfg: FluidConfig, x0) -> jnp.ndarray:
    """stages/celltypes.solid_mask with a GLOBAL x coordinate (border rule
    `update_active.comp:49-52` + obstacle boxes)."""
    lx, gy, gz = local_shape
    gx = cfg.grid_size[0]
    ix = (x0 + jnp.arange(lx))[:, None, None]
    iy = jnp.arange(gy)[None, :, None]
    iz = jnp.arange(gz)[None, None, :]
    mask = ((ix == 0) | (ix == gx - 1) | (iy == 0) | (iy == gy - 1)
            | (iz == 0) | (iz == gz - 1))
    for (x0b, y0, z0), (x1b, y1, z1) in cfg.solid_boxes:
        mask = mask | ((ix >= x0b) & (ix < x1b) & (iy >= y0) & (iy < y1)
                       & (iz >= z0) & (iz < z1))
    return mask


def _update_air_spmd(types: jnp.ndarray, cfg: FluidConfig, x0,
                     extra_solid=None) -> jnp.ndarray:
    """Stage 03 on a local block: the water-neighbor test exchanges one
    halo plane; the border/obstacle SOLID rule uses global coordinates."""
    water = types == CellType.WATER
    we = halo_extend(water, 1)
    around = jnp.zeros_like(we)
    for mv in MOVES:
        around = around | shifted(we, mv, fill=False)
    air = (~water) & halo_inner(around)
    out = jnp.where(air, jnp.uint8(CellType.AIR), types)
    solid = _solid_mask_spmd(types.shape, cfg, x0)
    if extra_solid is not None:
        solid = solid | (extra_solid != 0)   # dynamic solids (SceneFields)
    return jnp.where(solid, jnp.uint8(CellType.SOLID), out)


# ------------------------------------------------------------------- forces
def _forces_spmd(types: jnp.ndarray, vel: jnp.ndarray, cfg: FluidConfig,
                 x0, force_field=None) -> jnp.ndarray:
    """Stage 08 on a local block (gravity + fountain + extra forces); the
    fountain / force cells are GLOBAL cell indices."""
    lx, gy, gz = types.shape
    water = types == CellType.WATER
    wet_face_y = water | shifted(water, (0, -1, 0), fill=False)  # y: local
    ynz = (jnp.arange(gy) != 0).reshape(1, -1, 1)
    force = jnp.where(wet_face_y & ynz, cfg.gravity, 0.0).astype(vel.dtype)

    ix = x0 + jnp.arange(lx)

    def cell_mask(cx, cy, cz):
        return ((ix == cx)[:, None, None]
                & (jnp.arange(gy) == cy)[None, :, None]
                & (jnp.arange(gz) == cz)[None, None, :])

    fx, fy, fz = cfg.fountain
    force = force + jnp.where(cell_mask(fx, fy, fz) & wet_face_y,
                              cfg.fountain_force, 0.0).astype(vel.dtype)
    out = vel.at[1].add(cfg.dt * force)

    if cfg.extra_forces:
        water_e = halo_extend(water, 1)
        for (cx, cy, cz), fvec in cfg.extra_forces:
            cell = cell_mask(cx, cy, cz)
            for c in range(3):
                if fvec[c] == 0.0:
                    continue
                mv = tuple(-1 if k == c else 0 for k in range(3))
                wet_c = water | halo_inner(shifted(water_e, mv, fill=False))
                out = out.at[c].add(
                    jnp.where(cell & wet_c, cfg.dt * fvec[c], 0.0
                              ).astype(vel.dtype))

    if force_field is not None:
        # dynamic per-cell force field (SceneFields.force), local block;
        # the c-direction wetness test needs one x halo plane for c = 0
        water_e = halo_extend(water, 1)
        for c in range(3):
            mv = tuple(-1 if k == c else 0 for k in range(3))
            wet_c = water | halo_inner(shifted(water_e, mv, fill=False))
            out = out.at[c].add(
                jnp.where(wet_c, cfg.dt * force_field[c], 0.0
                          ).astype(vel.dtype))
    return out


# ------------------------------------------------------------------ advect
def _advect_spmd(types: jnp.ndarray, vel: jnp.ndarray, cfg: FluidConfig,
                 x0, gx_total: int) -> jnp.ndarray:
    """Stage 07 on a local block.  The Pallas fused kernel runs on the local
    slab with r-wide neighbor halo planes (global-x coordinate clamp via the
    kernel's x0 scalar); the XLA shift path runs on an (r+1)-extended block.
    The per-point "gather" method has no sharded form and falls back to
    shift (same semantics for in-CFL flows)."""
    from tpu_fluid.kernels import pallas_choice

    r = cfg.advect_max_displacement
    method = cfg.advect_method
    use_pallas, interpret = pallas_choice(cfg)
    if method == "auto":
        method = "pallas" if use_pallas else "shift"

    if method == "pallas":
        from tpu_fluid.kernels.advect import (advect_all_pallas,
                                              advect_component_pallas)
        _, lx, gy, gz = vel.shape
        types_e = halo_extend(types, 1)
        gshape = (gx_total, gy, gz)
        if gy * gz <= 128 * 128:
            cond3 = jnp.stack(
                [halo_inner(vstages._advect_condition(types_e, c, x0=x0 - 1))
                 for c in range(3)]).astype(jnp.uint8)
            halo = halo_planes(vel, r)
            return advect_all_pallas(vel, cond3, r, cfg.dt, halo=halo,
                                     x0=x0, global_shape=gshape,
                                     interpret=interpret)
        from tpu_fluid.kernels.advect import advect_one_pallas
        halo = halo_planes(vel, r)
        out = []
        for c in range(3):
            cond = halo_inner(vstages._advect_condition(types_e, c,
                                                        x0=x0 - 1))
            try:
                out.append(advect_one_pallas(
                    vel, cond, c, r, cfg.dt, halo=halo, x0=x0,
                    global_shape=gshape, interpret=interpret))
            except ValueError:
                vel_e = halo_extend(vel, 1)
                u = halo_inner(-vstages.face_center_velocity(vel_e, c)
                               * cfg.dt)
                halo_c = halo_planes(vel[c], r)
                out.append(advect_component_pallas(
                    vel[c], u, cond, r, tx=2, halo=halo_c, x0=x0,
                    global_shape=gshape, interpret=interpret))
        return jnp.stack(out)

    h = r + 1
    types_e = halo_extend(types, h)
    vel_e = halo_extend(vel, h)
    out_e = vstages.advect_shift(types_e, vel_e, cfg, x0=x0 - h,
                                 gx_total=gx_total)
    return halo_inner(out_e, h)


# ------------------------------------------------------------------- blur
def _blur_spmd(types: jnp.ndarray, f1: jnp.ndarray, f2: jnp.ndarray,
               cfg: FluidConfig):
    """Stage 18 on local detailed blocks: one halo plane per blur pass."""
    k = cfg.float_density_diffuse_coefficient
    skip = surface_fields.solid_parent_mask(types, cfg)

    def one_pass(src, dst):
        src_e = halo_extend(src, 1)
        nsum = jnp.zeros_like(src_e)
        for mv in MOVES:
            nsum = nsum + shifted(src_e, mv)
        blurred = (1.0 - 6.0 * k) * src + k * halo_inner(nsum)
        return jnp.where(skip, dst, blurred)

    for it in range(cfg.float_density_diffuse_steps):
        if it % 2 == 0:
            f2 = one_pass(f1, f2)
        else:
            f1 = one_pass(f2, f1)
    return f1, f2


# -------------------------------------------------------------- local step
def _local_step(state: FluidState, cfg: FluidConfig,
                n_shards: int, scene=None) -> FluidState:
    """One frame on this shard's local blocks (runs inside shard_map).
    Stage order identical to solver/step.simulation_step.  `scene` holds
    x-slab local blocks of the dynamic SceneFields, if any."""
    from tpu_fluid.kernels import fuse_grid_choice, pallas_choice
    use_pallas, interpret = pallas_choice(cfg)
    fuse_grid = fuse_grid_choice(cfg, scene)
    scene_solid = scene.solid if scene is not None else None
    scene_force = scene.force if scene is not None else None

    gx, gy, gz = cfg.grid_size
    lx = gx // n_shards
    x0 = jax.lax.axis_index(AXIS).astype(jnp.int32) * lx

    old_types = state.cell_types
    vel = state.velocity

    # 01-03: classify cells from particle occupancy (block-local max-pool)
    occ_sim = particles.occupancy_to_sim_grid(state.detailed_occ, cfg)

    if fuse_grid and lx >= 2:
        # stages 02-06 in the same fused Pallas kernel as the single-device
        # step, on local slabs with 2-wide ppermute halos (h=2: the stage-05
        # state machine reads stage-03 types of x+-1, whose air test reads
        # water at x+-2); central rows are bitwise-identical
        from tpu_fluid.kernels.grid_fused import classify_extrap_pallas
        halos = tuple(halo_planes(a, 2)
                      for a in (occ_sim, old_types, vel))
        types, vel = classify_extrap_pallas(
            occ_sim, old_types, vel, cfg, halos=halos, x0=x0,
            global_gx=gx, interpret=interpret)
    else:
        new_types = celltypes.update_water(occ_sim)
        new_types = _update_air_spmd(new_types, cfg, x0,
                                     extra_solid=scene_solid)
        # 04-05: extrapolation (radius-1: 1-halo blocks, keep interior)
        ot_e = halo_extend(old_types, 1)
        nt_e = halo_extend(new_types, 1)
        vel_e = halo_extend(vel, 1)
        extr_e = vstages.compute_extrapolated_velocities(ot_e, vel_e)
        vel = halo_inner(
            vstages.set_extrapolated_velocities(ot_e, nt_e, vel_e, extr_e))
        types = celltypes.commit_cell_types(new_types)

    # 07
    vel = _advect_spmd(types, vel, cfg, x0, gx)

    if fuse_grid and lx >= 2:
        # stages 08-11 fused (09 is the reference's no-op), 1-wide halos
        from tpu_fluid.kernels.grid_fused import forces_solids_div_pallas
        halos = (halo_planes(types, 1), halo_planes(vel, 1))
        vel, div = forces_solids_div_pallas(
            types, vel, cfg, halos=halos, x0=x0, global_gx=gx,
            interpret=interpret)
    else:
        vel = _forces_spmd(types, vel, cfg, x0,
                           force_field=scene_force)
        if not cfg.reference_diffuse_noop:
            vel = halo_inner(vstages.diffuse(halo_extend(types, 1),
                                             halo_extend(vel, 1), cfg))
        vel = halo_inner(vstages.apply_solids(halo_extend(types, 1),
                                              halo_extend(vel, 1), cfg))
        # 11: the i_c != 0 test over the extended x range is safe: the
        # excluded row is a discarded halo row, and the true x = 0 face is
        # masked by the SOLID border anyway.
        div = halo_inner(pressure.compute_divergence(halo_extend(vel, 1)))

    # 12-13
    p = pressure.jacobi_solve(types, div, cfg, axis_name=AXIS)
    if fuse_grid and lx >= 2:
        from tpu_fluid.kernels.grid_fused import project_pallas
        halos = (halo_planes(types, 1), halo_planes(p, 1),
                 halo_planes(vel, 1))
        vel = project_pallas(types, p, vel, cfg, halos=halos, x0=x0,
                             global_gx=gx, interpret=interpret)
    else:
        vel = halo_inner(pressure.pressure_project(
            halo_extend(types, 1), halo_extend(p, 1), halo_extend(vel, 1),
            cfg))

    # 14-15: two particle placements (cfg.particle_sharding):
    #  "index" — particles split by buffer index; each shard all_gathers the
    #    velocity field (one volume collective) and scatters occupancy over
    #    the FULL detailed grid, combined by psum_scatter.  The request-bound
    #    gather/scatter work — the single-chip bottleneck — divides by n.
    #  "domain" — particles live on the shard owning their x-slab
    #    (parallel/particles_domain.py): sampling reads a 1-plane halo, the
    #    scatters are slab-local with no collective, and a fixed-capacity
    #    ppermute exchange migrates boundary-crossers — communication scales
    #    with slab surface, not grid volume.
    domain = cfg.particle_sharding == "domain"
    move_vel = vel
    if cfg.volume_correction > 0.0:
        # volume-conservation drift (stages/volume.py), fully distributed:
        # this shard's x-slab of the global counts (slab-local scatter under
        # domain sharding; full-grid local scatter + psum_scatter under
        # index sharding), then the density Poisson + radius-1 drift stencil
        # run slab-local with ppermute halos, exactly like the pressure
        # solve.  The drift is added to the LOCAL velocity before any
        # gather, so sampling sees vel + drift at zero extra volume
        # collectives (drift is for sampling only; the state keeps the
        # divergence-free `vel`).
        from tpu_fluid.stages.volume import density_drift

        def with_drift():
            if domain:
                from tpu_fluid.parallel.particles_domain import \
                    cell_histogram_local
                counts = cell_histogram_local(state.positions, state.active,
                                              cfg.grid_size, x0, lx)
            else:
                from tpu_fluid.ops.scatter import particle_cell_histogram
                counts_full = particle_cell_histogram(
                    state.positions, state.active, cfg.grid_size)
                counts = jax.lax.psum_scatter(counts_full, AXIS,
                                              scatter_dimension=0,
                                              tiled=True)
            return vel + density_drift(counts, types, cfg,
                                       axis_name=AXIS, x0=x0)

        every = max(1, cfg.volume_correction_every)
        if every == 1:
            move_vel = with_drift()
        else:
            # K-step cadence (see solver/step.py): state.step is replicated,
            # so every shard takes the same branch and the in-branch
            # collectives (psum_scatter / drift halos) stay collective-safe
            move_vel = jax.lax.cond(state.step % every == 0, with_drift,
                                    lambda: vel)

    if domain:
        from tpu_fluid.parallel.particles_domain import (
            detailed_occupancy_local, migrate, migrate_capacity,
            move_particles_local)
        pos = move_particles_local(move_vel, state.positions, state.active,
                                   cfg, x0, use_pallas, interpret)
        # buffer capacity derives from the state's ACTUAL local slot count
        # (census-sized by domain_shard_state), not the global-mean formula
        pos, active, ndrop = migrate(pos, state.active, x0, lx,
                                     migrate_capacity(pos.shape[0], cfg))
        dropped = state.dropped + jax.lax.psum(ndrop, AXIS)
        r = cfg.surface_render_resolution
        occ = detailed_occupancy_local(pos, active, cfg, x0 * r, lx * r)
    else:
        active = state.active
        dropped = state.dropped
        vel_full = jax.lax.all_gather(move_vel, AXIS, axis=1, tiled=True)
        pos = particles.move_particles(vel_full, state.positions,
                                       state.active, cfg)
        occ_full = particles.detailed_occupancy(pos, state.active, cfg)
        counts = jax.lax.psum_scatter(occ_full, AXIS, scatter_dimension=0,
                                      tiled=True)
        occ = (counts > 0).astype(jnp.uint8)

    # 16-18
    if cfg.surface_enabled and cfg.surface_method == "levelset":
        # rebuilt-per-frame chamfer level set (surface/levelset.py) on a
        # halo-extended block: the band resolves sweeps+smooth cells, so
        # that halo width makes central rows bitwise-identical
        from tpu_fluid.surface.levelset import levelset_field
        r = cfg.surface_render_resolution
        hs = cfg.levelset_sweeps_value + cfg.levelset_smooth
        ht = -(-hs // r)                        # sim-cell halo
        if ht <= types.shape[0]:
            f_e = levelset_field(halo_extend(types, ht),
                                 halo_extend(occ, ht * r), cfg)
            f1 = f2 = halo_inner(f_e, ht * r)
        else:
            # band halo wider than the local slab (tiny shards): compute on
            # the replicated full grids and slice the local block — still
            # bitwise-identical to single-device (halo_extend would return
            # fewer planes than requested here and silently corrupt)
            occ_full = jax.lax.all_gather(occ, AXIS, axis=0, tiled=True)
            types_full = jax.lax.all_gather(types, AXIS, axis=0, tiled=True)
            f_full = levelset_field(types_full, occ_full, cfg)
            f1 = f2 = jax.lax.dynamic_slice_in_dim(
                f_full, x0 * r, types.shape[0] * r, axis=0)
        inertia = state.inertia
    elif cfg.surface_enabled:
        from tpu_fluid.kernels import pallas_choice
        use_pallas, interpret = pallas_choice(cfg)
        r = cfg.surface_render_resolution
        h = cfg.float_density_diffuse_steps + 1
        lx_det = types.shape[0] * r
        if use_pallas and lx_det >= h:
            # fused Pallas kernel on the local detailed slab: one h-wide
            # halo exchange (h = blur_steps + 1) replaces the per-stage /
            # per-pass exchanges; central rows are bitwise-identical to the
            # single-device kernel (kernels/surface_fused.py).  Slabs
            # narrower than the halo fall back to the per-pass jnp path.
            # surface_fused_auto y-chunks planes past the slab VMEM budget.
            from tpu_fluid.kernels.surface_fused import surface_fused_auto
            skip = surface_fields.solid_parent_mask(types, cfg
                                                    ).astype(jnp.uint8)
            f2_old = state.float_dens_2
            halos = tuple(halo_planes(a, h)
                          for a in (occ, state.inertia, f2_old, skip))
            inertia, f1, f2 = surface_fused_auto(
                occ, state.inertia, f2_old, skip,
                steps=cfg.float_density_diffuse_steps,
                k=cfg.float_density_diffuse_coefficient,
                inc_filled=cfg.inertia_increase_filled,
                inc_neigh=cfg.inertia_increase_neighbour,
                required_hits=cfg.inertia_required_neighbour_hits,
                dec=cfg.inertia_decrease,
                max_inertia=cfg.max_inertia,
                div_coef=cfg.float_density_division_coefficient,
                halos=halos, x0=x0 * r, global_gx=gx * r,
                interpret=interpret)
        else:
            inertia = halo_inner(surface_fields.update_inertia(
                halo_extend(occ, 1), halo_extend(state.inertia, 1), cfg))
            f1 = surface_fields.float_densities(inertia, cfg)
            f1, f2 = _blur_spmd(types, f1, state.float_dens_2, cfg)
    else:
        inertia, f1, f2 = (state.inertia, state.float_dens_1,
                           state.float_dens_2)

    return FluidState(
        velocity=vel,
        cell_types=types,
        inertia=inertia,
        float_dens_1=f1,
        float_dens_2=f2,
        positions=pos,
        active=active,
        detailed_occ=occ,
        step=state.step + 1,
        dropped=dropped,
    )


# ------------------------------------------------------------ entry points
def validate_spmd_config(cfg: FluidConfig, n_shards: int) -> None:
    gx = cfg.grid_size[0]
    if gx % n_shards:
        raise ValueError(f"grid x size {gx} must divide the mesh "
                         f"({n_shards} shards)")
    if cfg.particle_sharding == "domain":
        # slot buffers are allocated per shard (particles_domain.domain_slots
        # rounds to divide); sampling reads a slab-local packed table
        if cfg.particle_sampler != "packed":
            raise ValueError("particle_sharding='domain' requires the "
                             "packed sampler")
    elif cfg.particle_count % n_shards:
        raise ValueError(f"particle_count {cfg.particle_count} must divide "
                         f"the mesh ({n_shards} shards)")
    lx = gx // n_shards
    if lx < cfg.advect_max_displacement + 1:
        raise ValueError(f"local slab width {lx} too small for advection "
                         f"halo {cfg.advect_max_displacement + 1}")


def _check_vma(cfg: FluidConfig) -> bool:
    """shard_map's varying-manual-axes check cannot type pallas_call outputs
    (ShapeDtypeStruct has no vma), so it stays on only for the XLA path."""
    from tpu_fluid.kernels import pallas_choice
    use_pallas, _ = pallas_choice(cfg)
    return not use_pallas


def scene_pspecs(scene):
    """x-slab PartitionSpecs matching a SceneFields instance (None leaves
    stay None)."""
    from jax.sharding import PartitionSpec as P

    from tpu_fluid.core.scene_fields import SceneFields
    return SceneFields(
        solid=None if scene.solid is None else P(AXIS),
        force=None if scene.force is None else P(None, AXIS))


def spmd_step(mesh: Mesh, cfg: FluidConfig, donate: bool = True,
              scene=None):
    """A jitted step over the mesh: shard_map of the local step with the
    canonical x-slab shardings (parallel/mesh.state_pspecs).

    With `scene` (a SceneFields template — any instance with the right
    fields present), the returned function takes (state, scene) and shards
    the scene arrays as x-slabs alongside the state."""
    n = mesh.devices.size
    validate_spmd_config(cfg, n)
    specs = state_pspecs()
    if scene is not None:
        fn = jax.shard_map(
            lambda s, sc: _local_step(s, cfg, n, scene=sc),
            mesh=mesh, in_specs=(specs, scene_pspecs(scene)),
            out_specs=specs, check_vma=_check_vma(cfg))
        return jax.jit(fn, donate_argnums=(0,) if donate else ())
    fn = jax.shard_map(
        functools.partial(_local_step, cfg=cfg, n_shards=n),
        mesh=mesh, in_specs=(specs,), out_specs=specs,
        check_vma=_check_vma(cfg))
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def spmd_multi_step(mesh: Mesh, cfg: FluidConfig, n_steps: int,
                    donate: bool = True):
    """n frames per dispatch: lax.scan over the local step, entirely inside
    one shard_map region (one program, no per-step re-entry)."""
    n = mesh.devices.size
    validate_spmd_config(cfg, n)
    specs = state_pspecs()

    def local_multi(state):
        def body(s, _):
            return _local_step(s, cfg, n), None
        out, _ = jax.lax.scan(body, state, None, length=n_steps)
        return out

    fn = jax.shard_map(local_multi, mesh=mesh, in_specs=(specs,),
                       out_specs=specs, check_vma=_check_vma(cfg))
    return jax.jit(fn, donate_argnums=(0,) if donate else ())
