"""Full simulation step: the reference's 19-stage per-frame compute graph
(`fluid_flow_sections.h:159-391`, SURVEY.md §3.2) as one pure function over
the state pytree, jit-compiled into a single XLA program.

The reference's flow-section engine derives barriers from declared resource
states; here XLA's data dependencies play that role, its fusion pass replaces
the hand-scheduled dispatch list, and donated ping-pong buffers replace the
VELOCITIES_1/2, PRESSURES_1/2 pairs.
"""

from __future__ import annotations

import functools

import jax

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.core.state import FluidState
from tpu_fluid.stages import celltypes, particles, pressure, surface_fields
from tpu_fluid.stages import velocity as vstages


def simulation_step(state: FluidState, cfg: FluidConfig,
                    scene=None) -> FluidState:
    """One frame, stage order exactly as the reference's step section list
    (`fluid_flow_sections.h:159-391`; SURVEY.md §3.2):

      01 histogram -> 02 water -> 03 air/solid -> 04/05 extrapolate ->
      06 commit types -> 07 advect -> 08 forces -> 09 diffuse -> 10 solids ->
      11 divergence -> 12 Jacobi xN -> 13 project -> 14 move particles ->
      15 detail histogram -> 16 inertia -> 17 signed field -> 18 blur xM
    """
    from tpu_fluid.kernels import fuse_grid_choice, pallas_choice
    _, interpret = pallas_choice(cfg)
    fuse_grid = fuse_grid_choice(cfg, scene)
    scene_solid = scene.solid if scene is not None else None
    scene_force = scene.force if scene is not None else None

    old_types = state.cell_types
    vel = state.velocity

    # 01-03: classify cells from particle occupancy.  state.detailed_occ is
    # the occupancy of the current positions, scattered at the end of the
    # previous step (one scatter/step serves stages 01 and 15, since the
    # pipeline only consumes density > 0 — see stages/particles.py).
    occ_sim = particles.occupancy_to_sim_grid(state.detailed_occ, cfg)

    if fuse_grid:
        # stages 02-06 in one Pallas pass (kernels/grid_fused.py)
        from tpu_fluid.kernels.grid_fused import classify_extrap_pallas
        types, vel = classify_extrap_pallas(occ_sim, old_types, vel, cfg,
                                            interpret=interpret)
    else:
        new_types = celltypes.update_water(occ_sim)
        new_types = celltypes.update_air(new_types, cfg,
                                         extra_solid=scene_solid)
        # 04-05: velocity extrapolation into newly-active faces
        extrapolated = vstages.compute_extrapolated_velocities(old_types,
                                                               vel)
        vel = vstages.set_extrapolated_velocities(old_types, new_types, vel,
                                                  extrapolated)
        # 06: the new classification becomes current
        types = celltypes.commit_cell_types(new_types)

    # 07: advect (its own Pallas/XLA dispatch)
    vel = vstages.advect(types, vel, cfg)

    if fuse_grid:
        # stages 08-11 in one Pallas pass (09 is the reference's no-op)
        from tpu_fluid.kernels.grid_fused import forces_solids_div_pallas
        vel, div = forces_solids_div_pallas(types, vel, cfg,
                                            interpret=interpret)
    else:
        # 08-10: force, diffuse, solid-clamp
        vel = vstages.apply_forces(types, vel, cfg,
                                   force_field=scene_force)
        vel = vstages.diffuse(types, vel, cfg)
        vel = vstages.apply_solids(types, vel, cfg)
        # 11
        div = pressure.compute_divergence(vel)

    # 12-13: pressure solve + projection
    p = pressure.jacobi_solve(types, div, cfg)
    if fuse_grid:
        from tpu_fluid.kernels.grid_fused import project_pallas
        vel = project_pallas(types, p, vel, cfg, interpret=interpret)
    else:
        vel = pressure.pressure_project(types, p, vel, cfg)

    # 14: move particles through the projected field (plus the optional
    # volume-conservation drift, sampling-only — stages/volume.py)
    move_vel = vel
    if cfg.volume_correction > 0.0:
        from tpu_fluid.stages.volume import corrected_move_velocity
        every = max(1, cfg.volume_correction_every)
        if every == 1:
            move_vel = corrected_move_velocity(vel, state.positions,
                                               state.active, types, cfg)
        else:
            # amortize the correction's histogram + Poisson cost (measured
            # 53.9 -> 27.1 steps/s at 128^3/1M when applied every step —
            # NOTES round-5): drift accumulates over thousands of steps,
            # so a K-step cadence keeps the controller effective at ~1/K
            # of the cost.  lax.cond executes ONE branch at runtime.
            move_vel = jax.lax.cond(
                state.step % every == 0,
                lambda: corrected_move_velocity(
                    vel, state.positions, state.active, types, cfg),
                lambda: vel)
    pos = particles.move_particles(move_vel, state.positions, state.active,
                                   cfg)

    # 15-18: surface field update (occupancy scatter on the moved particles;
    # also consumed by the next frame's stage 01)
    occ = particles.detailed_occupancy(pos, state.active, cfg)
    if cfg.surface_enabled:
        inertia, f1, f2 = surface_fields.update_surface_fields(
            types, occ, state.inertia, state.float_dens_2, cfg)
    else:  # sim-only mode: surface stages skipped
        inertia, f1, f2 = state.inertia, state.float_dens_1, \
            state.float_dens_2

    return FluidState(
        velocity=vel,
        cell_types=types,
        inertia=inertia,
        float_dens_1=f1,
        float_dens_2=f2,
        positions=pos,
        active=state.active,
        detailed_occ=occ,
        step=state.step + 1,
        dropped=state.dropped,
    )


@functools.partial(jax.jit, static_argnums=1, donate_argnums=0)
def jit_step(state: FluidState, cfg: FluidConfig,
             scene=None) -> FluidState:
    """Jitted single step with full state donation (keeps memory flat, the
    TPU analogue of the reference's in-place image updates).  `scene` is an
    optional core/scene_fields.SceneFields (dynamic solids / force field)."""
    return simulation_step(state, cfg, scene)


@functools.partial(jax.jit, static_argnums=(1, 2), donate_argnums=0)
def jit_multi_step(state: FluidState, cfg: FluidConfig,
                   n_steps: int, scene=None) -> FluidState:
    """n frames in one XLA program (lax.scan over the step); host touches the
    device once per n frames, mirroring how the reference's host only submits
    command buffers (`main.cpp:176`)."""
    def body(s, _):
        return simulation_step(s, cfg, scene), None
    out, _ = jax.lax.scan(body, state, None, length=n_steps)
    return out
