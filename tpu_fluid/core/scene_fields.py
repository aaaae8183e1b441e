"""Dynamic scene fields: per-cell solid mask and force vectors as device
arrays, supplied per run rather than baked into the config.

This implements the reference's first stated future-work item
(`README.md:156`): "solid cells are hardcoded ... forces have to be
hardcoded in shaders.  It would be better to have the ability to specify
these dynamically ... one [texture] that contains booleans whether the
current cell is solid or not, and one that contains a vector in each cell
representing the magnitude of force affecting fluid in it."

`SceneFields` is a pytree passed alongside the state to `simulation_step` /
`jit_step` / the SPMD step; both arrays are x-slab sharded like every grid
field.  Config-level `solid_boxes` / `extra_forces` (static, hashable)
remain for simple scenes; these fields cover arbitrary geometry — load from
.npy via the CLI (`--solid-npy` / `--force-npy`) or build with the helpers
below.

Semantics:
  solid  (X, Y, Z) bool/uint8 — cells forced to SOLID in stage 03, exactly
         like the border/obstacle rule (`update_active.comp:49-52`); the
         stage-10 repel rules then apply to them automatically.
  force  (3, X, Y, Z) float32 — per-cell force vector; component c is
         applied to the cell's face c when that face is wet (the cell or
         its lower-c neighbor is WATER), the same wetness rule gravity uses
         (`forces.comp:33-44`), scaled by dt in stage 08.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpu_fluid.core.config import FluidConfig


class SceneFields(NamedTuple):
    solid: Optional[jax.Array] = None   # (X, Y, Z) uint8/bool
    force: Optional[jax.Array] = None   # (3, X, Y, Z) float32

    def validate(self, cfg: FluidConfig) -> "SceneFields":
        g = tuple(cfg.grid_size)
        if self.solid is not None and tuple(self.solid.shape) != g:
            raise ValueError(f"scene solid shape {self.solid.shape} != "
                             f"grid {g}")
        if self.force is not None and tuple(self.force.shape) != (3,) + g:
            raise ValueError(f"scene force shape {self.force.shape} != "
                             f"(3, *{g})")
        return self


def solid_sphere(cfg: FluidConfig, center, radius) -> jnp.ndarray:
    """A spherical obstacle as a (X, Y, Z) uint8 solid mask."""
    gx, gy, gz = cfg.grid_size
    ix = np.arange(gx)[:, None, None]
    iy = np.arange(gy)[None, :, None]
    iz = np.arange(gz)[None, None, :]
    cx, cy, cz = center
    d2 = (ix - cx) ** 2 + (iy - cy) ** 2 + (iz - cz) ** 2
    return jnp.asarray((d2 <= radius * radius).astype(np.uint8))


def uniform_force(cfg: FluidConfig, vector) -> jnp.ndarray:
    """A constant force field (e.g. wind) as (3, X, Y, Z) float32."""
    g = cfg.grid_size
    f = np.zeros((3,) + tuple(g), np.float32)
    for c in range(3):
        f[c] = float(vector[c])
    return jnp.asarray(f)


def vortex_force(cfg: FluidConfig, center_xz, strength) -> jnp.ndarray:
    """A y-axis vortex force field around `center_xz` (demo helper)."""
    gx, gy, gz = cfg.grid_size
    ix = np.arange(gx)[:, None, None] - center_xz[0]
    iz = np.arange(gz)[None, None, :] - center_xz[1]
    r2 = np.maximum(ix ** 2 + iz ** 2, 1.0)
    f = np.zeros((3, gx, gy, gz), np.float32)
    f[0] = -iz / r2 * strength
    f[2] = ix / r2 * strength
    return jnp.asarray(f)
