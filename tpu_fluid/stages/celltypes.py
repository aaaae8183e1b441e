"""Cell classification stages (02, 03, 06 in the reference pipeline).

Reference: `02_update_water/update_water.comp`, `03_update_air/
update_active.comp`, `06_update_cell_types/update_cell_types.comp`.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu_fluid.core.types import CellType
from tpu_fluid.ops.stencil import MOVES, shifted


def update_water(densities: jnp.ndarray) -> jnp.ndarray:
    """Stage 02: cells with >0 particles are WATER, the rest INACTIVE
    (`update_water.comp:23-34`; AIR is assigned by stage 03)."""
    return jnp.where(densities > 0,
                     jnp.uint8(CellType.WATER),
                     jnp.uint8(CellType.INACTIVE))


def solid_mask(shape, cfg=None) -> jnp.ndarray:
    """Static solid cells: the domain border (`update_active.comp:49-52`)
    plus any configured obstacle boxes (the reference's commented-out ramp,
    `update_active.comp:50`, generalized)."""
    gx, gy, gz = shape
    ix = jnp.arange(gx)[:, None, None]
    iy = jnp.arange(gy)[None, :, None]
    iz = jnp.arange(gz)[None, None, :]
    mask = ((ix == 0) | (ix == gx - 1) | (iy == 0) | (iy == gy - 1)
            | (iz == 0) | (iz == gz - 1))
    if cfg is not None:
        for (x0, y0, z0), (x1, y1, z1) in cfg.solid_boxes:
            mask = mask | ((ix >= x0) & (ix < x1) & (iy >= y0) & (iy < y1)
                           & (iz >= z0) & (iz < z1))
    return mask


def update_air(types: jnp.ndarray, cfg=None, extra_solid=None) -> jnp.ndarray:
    """Stage 03: static solid cells (border + obstacles) become SOLID;
    non-water interior cells with >=1 of 6 neighbors WATER become AIR
    (`update_active.comp:45-66`).

    The reference runs this in-place over one image, so neighbor reads race
    with border-solid writes; we resolve the race deterministically by reading
    all neighbor water flags from the stage-02 output (a neighbor that turns
    SOLID here was never WATER anyway except at the border, where the result
    is overridden to SOLID regardless).
    """
    solid = solid_mask(types.shape, cfg)
    if extra_solid is not None:
        # dynamic per-cell solids (core/scene_fields.SceneFields.solid) —
        # the reference's future-work "solid boolean texture"
        solid = solid | (extra_solid != 0)

    water = types == CellType.WATER
    water_around = jnp.zeros_like(water)
    for mv in MOVES:
        water_around = water_around | shifted(water, mv, fill=False)

    air = (~water) & water_around
    out = jnp.where(air, jnp.uint8(CellType.AIR), types)
    return jnp.where(solid, jnp.uint8(CellType.SOLID), out)


def commit_cell_types(new_types: jnp.ndarray) -> jnp.ndarray:
    """Stage 06: NEW_CELL_TYPES -> CELL_TYPES copy
    (`update_cell_types.comp:15-19`); a no-op functionally."""
    return new_types
