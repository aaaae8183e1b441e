"""Simulation configuration.

One frozen dataclass replaces the reference's compile-time constant header
(`simulation_constants.h:7-139`) *and* its hand-packed 264-byte STD140 uniform
buffer (`simulation_constants.h:153-174`, layout contract
`shaders_fluid/fluids_uniform_buffer_layout.txt`).  Everything — array shapes,
scene, physics constants, solver iteration counts — derives from this single
object, so there is no double-maintenance hazard between "host constants" and
"shader constants" (the hazard warned about at `simulation_constants.h:25-28`).

The config is hashable so it can be a `static_argnum` of `jax.jit`.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp


def deep_tuple(x):
    """Recursively convert lists to tuples at every nesting level.

    The config must stay hashable (it is a jit static argument), but JSON
    round-trips (CLI --config/--set, checkpoint metadata) turn nested tuples
    like `solid_boxes` / `extra_forces` into nested lists.
    """
    if isinstance(x, (list, tuple)):
        return tuple(deep_tuple(e) for e in x)
    return x


@dataclasses.dataclass(frozen=True)
class FluidConfig:
    # --- grid -------------------------------------------------------------
    # dimensions of the MAC simulation grid (reference: fluid_width/height/
    # depth = 20, simulation_constants.h:7)
    grid_size: Tuple[int, int, int] = (20, 20, 20)

    # --- particles ----------------------------------------------------------
    # max number of marker particles (simulation_constants.h:29)
    particle_count: int = 1_000_000
    # initial particle cube (simulation_constants.h:48-50)
    particle_init_cube_resolution: Tuple[int, int, int] = (100, 100, 100)
    particle_init_cube_offset: Tuple[float, float, float] = (5.0, 2.0, 1.5)
    particle_init_cube_size: Tuple[float, float, float] = (10.0, 10.0, 2.0)
    # Additional particle blobs, each (resolution, offset, size) with the
    # same per-cube spawn math as the primary cube.  Particle ids are
    # assigned consecutively: the primary cube takes ids [0, vol0), the first
    # extra cube [vol0, vol0+vol1), and so on; leftover ids are inactive.
    # Generalizes the reference's single-cube init kernel
    # (`00_init_particles/init_particles.comp:36-49`) to multi-body scenes.
    extra_particle_cubes: Tuple[Tuple[Tuple[int, int, int],
                                      Tuple[float, float, float],
                                      Tuple[float, float, float]], ...] = ()

    # --- physics ------------------------------------------------------------
    # simulation_constants.h:56-89
    dt: float = 0.01
    air_pressure: float = 1.0
    cell_width: float = 1.0
    fluid_density: float = 1.0
    gravity: float = 10.0           # +y is down in the reference scene
    diffusion_coefficient: float = 0.01
    jacobi_iters: int = 200
    fountain_position: Tuple[int, int, int] | None = None  # default: derived
    fountain_force: float = -3000.0
    solid_repel_velocity: float = 0.01
    # Static solid obstacles as cell-index AABBs ((x0,y0,z0),(x1,y1,z1)),
    # end-exclusive, marked SOLID during cell typing each frame.  The
    # reference hints at this with a commented-out ramp obstacle in its
    # border shader (`03_update_air/update_active.comp:50`).
    solid_boxes: Tuple[Tuple[Tuple[int, int, int],
                             Tuple[int, int, int]], ...] = ()
    # Extra constant forces: ((cell_x, cell_y, cell_z), (fx, fy, fz)) pairs
    # applied like the fountain (only to wet faces).  Generalizes the
    # reference's single hardcoded fountain — its README lists
    # "specify forces dynamically" as unimplemented future work.
    extra_forces: Tuple[Tuple[Tuple[int, int, int],
                              Tuple[float, float, float]], ...] = ()

    # --- surface (detailed grid) ---------------------------------------------
    # simulation_constants.h:36,112-127
    surface_render_resolution: int = 5
    max_inertia: int = 100
    inertia_increase_filled: int = 4
    inertia_required_neighbour_hits: int = 1
    inertia_increase_neighbour: int = 1
    inertia_decrease: int = 1
    float_density_division_coefficient: float = 30.0
    float_density_diffuse_coefficient: float = 0.1
    float_density_diffuse_steps: int = 4
    # False skips the surface-field stages 16-18 entirely (sim-only mode);
    # particle occupancy is still maintained (it drives cell typing)
    surface_enabled: bool = True

    # --- beyond-reference physics (reference README future work) -------------
    # Volume-conservation drift (stages/volume.py): particles drift down the
    # cell-density gradient at k * (count difference) per wet face, clamped
    # to +-volume_drift_max (velocity units).  0 = off = reference behavior
    # (whose fluid volume slowly expands, README.md:147-149).
    volume_correction: float = 0.0
    # Apply the correction every K steps (lax.cond; 1 = every step).  The
    # controller's histogram + density-Poisson measured 53.9 -> 27.1
    # steps/s at 128^3/1M when run per-step (NOTES round-5); drift
    # accumulates over thousands of steps, so K in the 2-8 range keeps it
    # effective at ~1/K of the cost.
    volume_correction_every: int = 1
    volume_drift_max: float = 2.0
    # Target particles-per-cell for the drift; None derives the initial
    # cube's density (particle_count / cube volume in cells).
    volume_target_density: float | None = None
    # Jacobi iterations of the density-projection Poisson solve.
    volume_jacobi_iters: int = 60
    # Surface-field construction: "inertia" = the reference's stages 16-18;
    # "levelset" = rebuilt-per-frame chamfer level set (surface/levelset.py)
    # — hole-free at high surface_render_resolution by construction.
    surface_method: str = "inertia"
    # Surface offset outside particles in detailed cells; None = auto,
    # 1.2 * mean inter-particle spacing (tuned on the r=5 hole benchmark:
    # zero interior holes with the quasi-Euclidean 26-neighbor chamfer).
    levelset_iso: float | None = None
    levelset_sweeps: int | None = None   # chamfer band; None = ceil(iso)+2
    levelset_smooth: int = 2             # box-blur passes on the field

    # --- faithfulness switches ------------------------------------------------
    # The reference's diffusion stage (09_diffuse/diffuse.comp:40) assigns the
    # diffused value to a scope-shadowed local, so the stage is effectively a
    # copy.  True reproduces that observed behavior; False enables the
    # (clearly intended) real diffusion.
    reference_diffuse_noop: bool = True
    # The reference's divergence fix reads PRESSURES_2, which after 200
    # alternating Jacobi iterations holds the 199th iterate
    # (fluid_flow_sections.h:321).  True reproduces that; False uses the last.
    reference_pressure_parity: bool = True

    # --- rendering ------------------------------------------------------------
    particle_render_color: Tuple[float, float, float] = (1.0, 0.0, 0.0)
    particle_render_size: float = 10.0
    particle_render_max_size: float = 20.0
    render_light_direction: Tuple[float, float, float] = (1.0, -3.0, 1.0)
    render_surface_ambient_color: Tuple[float, float, float] = (0.0, 0.0, 0.3)
    render_surface_diffuse_color: Tuple[float, float, float] = (0.0, 0.8, 0.7)
    background_color: Tuple[float, float, float] = (0.0, 0.0, 0.0)

    # --- numerics / performance ----------------------------------------------
    dtype: str = "float32"
    # Semi-Lagrangian backtrace displacement bound in cells for the gather-free
    # shift-select advection path ("shift").  Displacements are clamped to
    # [-R, R]; R=2 covers |v| <= 200 cells/s at dt=0.01.  "gather" is the
    # reference-shaped per-point gather path (slow on TPU, exact for any CFL).
    advect_max_displacement: int = 2
    advect_method: str = "auto"           # "auto" | "pallas" | "shift" | "gather"
    # Particle velocity sampling: "packed" = one 64-lane row gather per
    # particle from a precomputed neighborhood table (TPU-fast);
    # "gather" = 24 scalar gathers per particle (reference-shaped).
    particle_sampler: str = "packed"      # "packed" | "gather"
    # z-halves-paired 128-lane packed rows (even gz >= 128 only): halves
    # the table rows for full-tile writes, but the gathered rows buffer the
    # sample kernel round-trips through HBM doubles (512 B/particle of
    # which each particle uses 64 lanes).  A/B-able through
    # TPU_FLUID_BENCH_SET=packed_pair_z=false (round-5 roofline probes).
    packed_pair_z: bool = True
    # Pallas kernel dispatch: "auto" = Pallas on TPU, XLA elsewhere;
    # "on"/"off" force it; "interpret" runs the Pallas kernels through the
    # interpreter (any backend) — how CPU-mesh tests exercise the exact
    # TPU kernel code paths under multi-device sharding.
    pallas_mode: str = "auto"             # "auto" | "on" | "interpret" | "off"
    # Pressure solver: "jacobi" reproduces the reference exactly (and has
    # the K-fused Pallas fast path); "redblack" is Gauss-Seidel red-black —
    # ~2x convergence per sweep, XLA formulation only: jacobi_iters=100
    # redblack matches 200 plain Jacobi on residual
    # (tests/test_redblack.py).
    pressure_solver: str = "jacobi"
    # Fused sim-grid stage groups (kernels/grid_fused.py: 02-06, 08-11, 13)
    # as Pallas kernels instead of the jnp stages.  Default OFF: measured
    # slightly slower single-chip (46.6 vs 47.9 steps/s at the 128^3 bench —
    # XLA already consumer-fuses those stages nearly for free, and the
    # kernels add x-pad copies; at 256^3 it is a wash the other way,
    # 8.16 vs 8.07 steps/s).  Kept for the explicit-SPMD step, where one
    # fused halo exchange per group replaces per-stage exchanges.
    grid_fused: bool = False
    # Particle placement on the SPMD (multi-chip) path:
    #  "index"  — particles split round-robin by buffer index; stage 14
    #             all_gathers the velocity field so any shard can sample
    #             anywhere (one volume collective per step, grows with grid
    #             volume).
    #  "domain" — particles live on the shard owning their x-slab
    #             (parallel/particles_domain.py): sampling reads a 1-plane
    #             halo-extended LOCAL slab, the occupancy scatter is
    #             slab-local, and a fixed-capacity ppermute exchange migrates
    #             boundary-crossers each step — communication grows with
    #             surface area, not volume.  Needs slot slack for uneven
    #             particle distributions.
    particle_sharding: str = "index"      # "index" | "domain"
    # Slots allocated per shard = census peak (or particle_count/n without
    # a census) * slack, rounded up; a shard holding more than its slots
    # DROPS the overflow (deactivated, counted in diagnostics).  Slack is
    # a measured TIME tax, not just memory: every per-particle request op
    # (occupancy scatter, row gather, sort) runs over ALL slots, so its
    # cost scales with census_peak * slack — the 1-chip SPMD bench
    # measures 24.4 steps/s at 2.0 vs 41.1 at 1.25 (NOTES round-5).  1.5
    # on top of census-peak sizing still means >= 1.5x the largest slab's
    # initial population before any counted drop; the flagship scene's
    # per-slab peak only decays from init (the spawn cube is the densest
    # configuration — fluid spreads).
    particle_slot_slack: float = 1.5
    # Per-direction migration buffer = slots * frac; per-step one-hop
    # crossers beyond it are dropped (CFL keeps real counts ~surface/step).
    particle_migrate_frac: float = 0.25

    # ------------------------------------------------------------------ derived
    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def fountain(self) -> Tuple[int, int, int]:
        """Fountain base cell (simulation_constants.h:85)."""
        if self.fountain_position is not None:
            return self.fountain_position
        w, h, d = self.grid_size
        return (w // 2, h - 2, d // 2)

    @property
    def volume_target_density_value(self) -> float:
        """Particles-per-cell target for the volume drift: the explicit
        override, else the mean density of the initial particle bodies
        (ACTIVE particles over total cube volume — multi-blob scenes spawn
        prod(resolution) ids per cube, and leftover ids stay inactive)."""
        if self.volume_target_density is not None:
            return float(self.volume_target_density)
        cubes = ((self.particle_init_cube_resolution,
                  self.particle_init_cube_size),) + tuple(
            (res, size) for res, _off, size in self.extra_particle_cubes)
        active = 0
        vol = 0.0
        for res, size in cubes:
            active += res[0] * res[1] * res[2]
            vol += size[0] * size[1] * size[2]
        active = min(active, self.particle_count)
        return float(active) / max(vol, 1e-6)

    @property
    def levelset_iso_value(self) -> float:
        if self.levelset_iso is not None:
            return float(self.levelset_iso)
        spacing = (self.surface_render_resolution
                   / max(self.volume_target_density_value, 1e-6) ** (1 / 3))
        return max(0.8, 1.2 * spacing)

    @property
    def levelset_sweeps_value(self) -> int:
        if self.levelset_sweeps is not None:
            return int(self.levelset_sweeps)
        return int(-(-self.levelset_iso_value // 1)) + 2

    @property
    def detailed_size(self) -> Tuple[int, int, int]:
        """Detailed (surface) grid size (simulation_constants.h:37)."""
        r = self.surface_render_resolution
        return tuple(s * r for s in self.grid_size)

    @property
    def inertia_dtype(self):
        """HBM dtype of the detailed inertia field.  Stored values are
        clamped to [0, max_inertia] every step (densities_inertia.comp:62),
        so uint8 holds them exactly whenever max_inertia <= 255 — all
        arithmetic happens in int32 regardless; only the HBM residency
        narrows (read+write of a detailed-grid field per step: ~1 GB/step
        at the 256^3 config).  Values are identical either way."""
        return jnp.uint8 if 0 < self.max_inertia <= 255 else jnp.int32

    @property
    def surface_cells(self) -> Tuple[int, int, int]:
        """Marching-cubes cell grid: detailed size - 1 per dim
        (simulation_constants.h:139)."""
        return tuple(s - 1 for s in self.detailed_size)

    def replace(self, **kw) -> "FluidConfig":
        return dataclasses.replace(self, **kw)

    # -------------------------------------------------------------- factories
    @staticmethod
    def reference_scene() -> "FluidConfig":
        """The exact scene of the reference (20^3 box, 1M-particle slab,
        center-floor fountain)."""
        return FluidConfig()

    @staticmethod
    def scaled_scene(n: int,
                     particle_count: int = 1_000_000,
                     surface_render_resolution: int = 2,
                     jacobi_iters: int = 200) -> "FluidConfig":
        """Reference scene geometry scaled to an n^3 grid.

        Offsets/sizes scale with n/20 so the fluid occupies the same relative
        volume as the reference scene.
        """
        s = n / 20.0
        res = max(1, round(particle_count ** (1.0 / 3.0)))
        return FluidConfig(
            grid_size=(n, n, n),
            particle_count=particle_count,
            particle_init_cube_resolution=(res, res, res),
            particle_init_cube_offset=(5.0 * s, 2.0 * s, 1.5 * s),
            particle_init_cube_size=(10.0 * s, 10.0 * s, 2.0 * s),
            surface_render_resolution=surface_render_resolution,
            jacobi_iters=jacobi_iters,
            # fused grid-stage kernels win once XLA's consumer fusion has
            # big planes to re-materialize (measured 8.94 vs 8.86 steps/s
            # at 256^3 twice; a slight loss at 128^3 where it stays off)
            grid_fused=(n >= 256),
        )
