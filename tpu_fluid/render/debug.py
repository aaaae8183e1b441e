"""Debug data visualization — the reference's disabled pipeline 32
(`32_debug_display_data/display_data.vert:25-33`, toggled off at
`fluid_flow_sections.h:474`): one point per sim cell, colored blue -> red by
log(density + 1) / 8.  Here it renders any per-cell scalar field to a PNG
via the device splat renderer."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.render.splat import INF_DEPTH, project, splat_color, \
    splat_depth


def render_cell_field(field: jnp.ndarray, mvp, cfg: FluidConfig,
                      width: int = 512, height: int = 512,
                      log_scale: bool = True) -> jnp.ndarray:
    """field: (X, Y, Z) scalar (e.g. particle densities, pressure).
    Blue -> red colormap on log(field+1)/8 like the reference, or linear.
    Returns (H, W, 3) uint8."""
    gx, gy, gz = field.shape
    ix, iy, iz = jnp.meshgrid(jnp.arange(gx), jnp.arange(gy),
                              jnp.arange(gz), indexing="ij")
    centers = jnp.stack([ix, iy, iz], axis=-1).reshape(-1, 3) + 0.5
    vals = field.reshape(-1).astype(jnp.float32)
    if log_scale:
        t = jnp.clip(jnp.log(jnp.maximum(vals, 0) + 1.0) / 8.0, 0.0, 1.0)
    else:
        lo, hi = vals.min(), vals.max()
        t = (vals - lo) / jnp.maximum(hi - lo, 1e-20)
    color = jnp.stack([t, jnp.zeros_like(t), 1.0 - t], axis=-1)
    show = vals > 0 if log_scale else jnp.ones_like(vals, dtype=bool)

    px, py, d, front = project(jnp.asarray(mvp, jnp.float32),
                               centers.astype(jnp.float32), width, height)
    valid = show & front
    depth = jnp.full((width * height,), INF_DEPTH)
    depth = splat_depth(depth, px, py, d, valid, width, height)
    cbuf = jnp.zeros((width * height,), dtype=jnp.uint32)
    cbuf = splat_color(cbuf, depth, px, py, d, color, valid, width, height)

    hit = (cbuf >> 30) & 1
    img = jnp.stack([
        jnp.where(hit == 1, (cbuf >> 16) & 0xFF, 0),
        jnp.where(hit == 1, (cbuf >> 8) & 0xFF, 0),
        jnp.where(hit == 1, cbuf & 0xFF, 0),
    ], axis=-1).astype(jnp.uint8)
    return img.reshape(height, width, 3)
