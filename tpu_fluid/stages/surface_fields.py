"""Surface-field stages: density inertia (16), signed float field (17),
float-density blur (18).

Reference: `16_compute_detailed_densities_inertia/densities_inertia.comp`,
`17_compute_float_densities/float_densities.comp`,
`18_diffuse_float_densities/diffuse_densities.comp`;
rationale comment block `simulation_constants.h:92-109`.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.core.types import CellType
from tpu_fluid.ops.stencil import MOVES, shifted


def update_inertia(detailed_densities: jnp.ndarray, inertia: jnp.ndarray,
                   cfg: FluidConfig) -> jnp.ndarray:
    """Stage 16 (`densities_inertia.comp:30-62`): inertia += 4 if the cell has
    particles; if >= required neighbors are filled, += hits * 1; if unchanged
    this frame, decrease by 1 toward 0; clamp to max_inertia.  Out-of-grid
    neighbor densities read as 0 (not filled)."""
    filled = detailed_densities > 0
    dtype = inertia.dtype              # u8 storage computes in i32 exactly
    inertia = inertia.astype(jnp.int32)
    inc = jnp.where(filled, cfg.inertia_increase_filled, 0)

    hits = jnp.zeros(inertia.shape, dtype=jnp.int32)
    for mv in MOVES:
        hits = hits + shifted(filled, mv, fill=False)
    inc = inc + jnp.where(hits >= cfg.inertia_required_neighbour_hits,
                          hits * cfg.inertia_increase_neighbour, 0)

    increased = inertia + inc
    decreased = jnp.maximum(inertia - cfg.inertia_decrease, 0)
    new = jnp.where(inc == 0, decreased, increased)
    return jnp.minimum(new, cfg.max_inertia).astype(dtype)


def float_densities(inertia: jnp.ndarray, cfg: FluidConfig) -> jnp.ndarray:
    """Stage 17 (`float_densities.comp:22-28`): signed field whose
    0-isosurface is the fluid surface: -1 where inertia == 0, else
    inertia / division_coefficient."""
    pos = inertia.astype(jnp.float32) / cfg.float_density_division_coefficient
    return jnp.where(inertia == 0, -1.0, pos)


def solid_parent_mask(types: jnp.ndarray, cfg: FluidConfig) -> jnp.ndarray:
    """Detailed-grid mask of cells whose parent sim cell is SOLID
    (`diffuse_densities.comp:57`: cellAt(i / detailed_resolution))."""
    solid = types == CellType.SOLID
    r = cfg.surface_render_resolution
    for ax in range(3):
        solid = jnp.repeat(solid, r, axis=ax)
    return solid


def blur_float_densities(types: jnp.ndarray, f1: jnp.ndarray,
                         f2: jnp.ndarray, cfg: FluidConfig):
    """Stage 18 (`diffuse_densities.comp:45-63`): 6-point blur
    f' = (1-6k) f + k * sum of neighbors, ping-ponged `blur_steps` times,
    skipping (not writing) cells whose parent sim cell is SOLID.

    Returns (f1, f2) after the loop.  Both buffers persist across frames:
    skipped cells keep stale values exactly as the reference's images do.
    The renderer consumes the final blur pass (blur_steps applications); the
    reference reads its FLOAT_2 buffer, which with an even step count holds
    the (steps-1)-th pass — we keep the "renderer sees >= steps-1 blur
    passes" semantics rather than the off-by-one (SURVEY.md §2.4#18).
    """
    k = cfg.float_density_diffuse_coefficient
    skip = solid_parent_mask(types, cfg)

    def one_pass(src, dst):
        nsum = jnp.zeros_like(src)
        for mv in MOVES:
            nsum = nsum + shifted(src, mv)
        blurred = (1.0 - 6.0 * k) * src + k * nsum
        return jnp.where(skip, dst, blurred)

    for it in range(cfg.float_density_diffuse_steps):
        if it % 2 == 0:
            f2 = one_pass(f1, f2)
        else:
            f1 = one_pass(f2, f1)
    return f1, f2


def update_surface_fields(types: jnp.ndarray, occ: jnp.ndarray,
                          inertia: jnp.ndarray, f2: jnp.ndarray,
                          cfg: FluidConfig):
    """Stages 16-18 combined: (types, occupancy, inertia, stale f2) ->
    (inertia', f1', f2').

    Dispatches to the fused Pallas kernel (one HBM pass over the detailed
    grid) per cfg.pallas_mode, else composes the three jnp stages.  With
    cfg.surface_method == "levelset" the inertia/blur machinery is replaced
    by the rebuilt-per-frame chamfer level set (surface/levelset.py);
    inertia is carried through unchanged.
    """
    if cfg.surface_method == "levelset":
        from tpu_fluid.surface.levelset import levelset_field
        f = levelset_field(types, occ, cfg)
        return inertia, f, f

    from tpu_fluid.kernels import pallas_choice
    use_pallas, interpret = pallas_choice(cfg)
    if use_pallas:
        # surface_fused_auto y-chunks planes too large for the slab VMEM
        # budget (the 256^3 sim / 512^2-plane config), exact by overlap
        from tpu_fluid.kernels.surface_fused import surface_fused_auto
        skip = solid_parent_mask(types, cfg).astype(jnp.uint8)
        return surface_fused_auto(
            occ, inertia, f2, skip,
            steps=cfg.float_density_diffuse_steps,
            k=cfg.float_density_diffuse_coefficient,
            inc_filled=cfg.inertia_increase_filled,
            inc_neigh=cfg.inertia_increase_neighbour,
            required_hits=cfg.inertia_required_neighbour_hits,
            dec=cfg.inertia_decrease,
            max_inertia=cfg.max_inertia,
            div_coef=cfg.float_density_division_coefficient,
            interpret=interpret)
    inertia = update_inertia(occ, inertia, cfg)
    f1 = float_densities(inertia, cfg)
    f1, f2 = blur_float_densities(types, f1, f2, cfg)
    return inertia, f1, f2


def surface_field(state_f1: jnp.ndarray, state_f2: jnp.ndarray,
                  cfg: FluidConfig) -> jnp.ndarray:
    """The field the renderer should consume.

    blur_float_densities writes pass 1 into f2, pass 2 into f1, and so on
    alternating — so the final (n-th) pass lands in f2 for odd n and in f1
    for even n.  With zero blur passes f1 holds the unblurred stage-17 field.
    """
    if cfg.float_density_diffuse_steps % 2 == 1:
        return state_f2
    return state_f1
