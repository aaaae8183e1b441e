"""Device-side headless rendering: z-buffered point/sample splatting.

Replaces the reference's two graphics pipelines with gather/scatter-style
device passes producing an RGB image in HBM:

 - particle pass (reference `30_render_particles/render.vert:28-45` +
   `render.frag:20-26`): one point per active particle, screen size
   min(base/depth, max) pixels, drawn as a circle in the particle color,
   depth tested against the surface;
 - surface pass (reference `31_render_surface` raster stage): the marching-
   cubes triangles are densely sampled (fixed barycentric pattern per
   triangle) and each sample splats with the triangle's flat-shaded color
   `ambient + max(0, dot(-L, N)) * diffuse`
   (`render_surface.frag:21-26`).

Depth resolution uses the two-pass scatter idiom (TPU has no z-buffered
raster unit): pass 1 scatter-min builds the depth buffer, pass 2 writes the
color of every sample that won its pixel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpu_fluid.core.config import FluidConfig

INF_DEPTH = jnp.float32(3.4e38)


def project(mvp: jnp.ndarray, points: jnp.ndarray, width: int, height: int):
    """points (N,3) world -> (pixel_x, pixel_y, view_depth, in_front)."""
    p = jnp.concatenate([points, jnp.ones_like(points[:, :1])], axis=-1)
    clip = p @ mvp.T
    w = clip[:, 3]
    in_front = w > 1e-6
    ndc = clip[:, :3] / jnp.maximum(w, 1e-6)[:, None]
    px = (ndc[:, 0] * 0.5 + 0.5) * width
    py = (ndc[:, 1] * 0.5 + 0.5) * height
    return px, py, w, in_front


def _flat(px, py, width, height, valid):
    xi = jnp.floor(px).astype(jnp.int32)
    yi = jnp.floor(py).astype(jnp.int32)
    ok = valid & (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height)
    return jnp.where(ok, yi * width + xi, 0), ok


def splat_depth(depth_buf, px, py, depth, valid, width, height):
    idx, ok = _flat(px, py, width, height, valid)
    d = jnp.where(ok, depth, INF_DEPTH)
    return depth_buf.at[idx].min(d)


def splat_color(color_buf, depth_buf, px, py, depth, color, valid,
                width, height, tol=1e-6):
    """Write color where this sample's depth equals the depth-buffer winner."""
    idx, ok = _flat(px, py, width, height, valid)
    won = ok & (depth <= depth_buf[idx] * (1 + tol))
    # scatter-max on a packed RGB word; ties pick the larger packed value
    packed = (jnp.clip(color[:, 0] * 255, 0, 255).astype(jnp.uint32) << 16 |
              jnp.clip(color[:, 1] * 255, 0, 255).astype(jnp.uint32) << 8 |
              jnp.clip(color[:, 2] * 255, 0, 255).astype(jnp.uint32))
    packed = jnp.where(won, packed | (1 << 30), 0).astype(jnp.uint32)
    return color_buf.at[idx].max(packed)


def _bary_lattice(subdiv: int) -> np.ndarray:
    """Barycentric sample lattice: all (i,j,k)/S with i+j+k = S —
    (S+1)(S+2)/2 points covering the triangle evenly."""
    pts = []
    for i in range(subdiv + 1):
        for j in range(subdiv + 1 - i):
            k = subdiv - i - j
            pts.append((i / subdiv, j / subdiv, k / subdiv))
    return np.array(pts, dtype=np.float32)


REFERENCE_VIEWPORT = 1400.0  # the reference's window edge (main.cpp:35)


def render_particles_and_surface(positions, active, tris, tri_normals,
                                 tri_valid, mvp, cfg: FluidConfig,
                                 width: int = 1024, height: int = 1024,
                                 surface_subdiv: int = 4,
                                 particle_radius: int | None = None,
                                 max_sprite_radius: int = 3,
                                 fine_tri_budget: int = 65536):
    """Full frame: surface triangles (screen-adaptive sample splat) +
    depth-scaled particle sprites.

    tris: (T, 3, 3) world-space triangles (masked by tri_valid); pass
    tris=None to skip the surface pass.  Returns (H, W, 3) uint8.

    particle_radius=None (default) scales each sprite with depth like the
    reference's `gl_PointSize = min(base/w, max)` (`30_render_particles/
    render.vert:33-35`), normalized from its 1400px window to this viewport
    and capped at `max_sprite_radius` px radius (caps the splat pass count);
    an int pins every sprite to that fixed pixel radius.

    Surface triangles whose projection exceeds the base lattice's ~1px
    sample spacing are re-sampled through two finer masked lattices
    (triangles compacted to `fine_tri_budget` / 1/4th of it first), so large
    near-camera triangles don't leave pixel holes the way a fixed lattice
    does — the splat analogue of the reference's hardware rasterization.
    """
    w, h = width, height
    mvp = jnp.asarray(mvp, dtype=jnp.float32)
    depth = jnp.full((w * h,), INF_DEPTH)
    color = jnp.zeros((w * h,), dtype=jnp.uint32)

    passes = []  # (px, py, depth, valid, color_rgb)

    # --- surface samples --------------------------------------------------
    if tris is not None:
        light = np.asarray(cfg.render_light_direction, dtype=np.float32)
        light = light / np.linalg.norm(light)
        lam = jnp.maximum(0.0, -(tri_normals @ jnp.asarray(light)))
        amb = jnp.asarray(cfg.render_surface_ambient_color)
        dif = jnp.asarray(cfg.render_surface_diffuse_color)
        tri_color = amb[None, :] + lam[:, None] * dif[None, :]   # (T, 3)

        # per-triangle projected extent (px): max abs vertex-pair delta over
        # the FRONT vertices only, so partially-clipped near-camera triangles
        # still refine (a behind-camera vertex projects to garbage and would
        # otherwise force ext to 0 or blow it up)
        vx, vy, _, vfront = project(mvp, tris.reshape(-1, 3), w, h)
        vx = vx.reshape(-1, 3)
        vy = vy.reshape(-1, 3)
        vfront = vfront.reshape(-1, 3)
        big = jnp.float32(1e9)
        ext = jnp.maximum(
            jnp.where(vfront, vx, -big).max(1) - jnp.where(vfront, vx,
                                                           big).min(1),
            jnp.where(vfront, vy, -big).max(1) - jnp.where(vfront, vy,
                                                           big).min(1))
        ext = jnp.where(tri_valid & vfront.any(1), ext, 0.0)

        def lattice_pass(sel_tris, sel_colors, sel_valid, subdiv):
            bary = _bary_lattice(subdiv)
            pts = jnp.einsum("sk,tkd->tsd", jnp.asarray(bary), sel_tris)
            px, py, d, front = project(mvp, pts.reshape(-1, 3), w, h)
            s = bary.shape[0]
            valid = jnp.repeat(sel_valid, s) & front
            col = jnp.repeat(sel_colors, s, axis=0)
            passes.append((px, py, d, valid, col))

        # base lattice: hole-free for triangles up to ~subdiv px
        lattice_pass(tris, tri_color, tri_valid, surface_subdiv)

        # adaptive refinement: compact the (few, near-camera) triangles that
        # project larger, and re-sample them through finer lattices
        for threshold, budget, subdiv in (
                (float(surface_subdiv), fine_tri_budget, 10),
                (10.0, max(1, fine_tri_budget // 4), 24)):
            # top_k by extent: when more than `budget` triangles exceed the
            # threshold, the LARGEST ones (the worst holes) win the slots
            # instead of whichever happened to come first in index order
            ext_masked = jnp.where(tri_valid & (ext > threshold), ext, -1.0)
            kb = min(budget, ext_masked.shape[0])
            vals, ids = jax.lax.top_k(ext_masked, kb)
            sub_valid = vals > 0.0
            lattice_pass(jnp.take(tris, ids, axis=0),
                         jnp.take(tri_color, ids, axis=0),
                         sub_valid, subdiv)

    # --- particles ---------------------------------------------------------
    px, py, d, front = project(mvp, positions, w, h)
    pcol = jnp.broadcast_to(
        jnp.asarray(cfg.particle_render_color, dtype=jnp.float32),
        (positions.shape[0], 3))
    if particle_radius is None:
        # reference point size: min(base/w, max) px on a 1400px viewport,
        # interpreted as the sprite diameter (frag discards outside the
        # radius-0.5 point coord circle, render.frag:20-26)
        size_px = jnp.minimum(cfg.particle_render_size / jnp.maximum(d, 1e-6),
                              cfg.particle_render_max_size)
        r_px = jnp.clip(0.5 * size_px * (min(w, h) / REFERENCE_VIEWPORT),
                        0.0, float(max_sprite_radius))
        rmax = max_sprite_radius
    else:
        r_px = jnp.full(d.shape, float(particle_radius))
        rmax = particle_radius
    r2 = jnp.maximum(r_px, 0.5) ** 2   # center pixel always lit
    for dx in range(-rmax, rmax + 1):
        for dy in range(-rmax, rmax + 1):
            if dx * dx + dy * dy > rmax * rmax:
                continue  # never inside any sprite's circle
            if dx == 0 and dy == 0:
                passes.append((px, py, d, active & front, pcol))
                continue
            lit = (dx * dx + dy * dy) <= r2
            passes.append((px + dx, py + dy, d, active & front & lit, pcol))

    for (ppx, ppy, pd, pv, _) in passes:
        depth = splat_depth(depth, ppx, ppy, pd, pv, w, h)
    for (ppx, ppy, pd, pv, pc) in passes:
        color = splat_color(color, depth, ppx, ppy, pd, pc, pv, w, h)

    bg = (np.asarray(cfg.background_color) * 255).astype(np.uint8)
    r = ((color >> 16) & 0xFF).astype(jnp.uint8)
    g = ((color >> 8) & 0xFF).astype(jnp.uint8)
    b = (color & 0xFF).astype(jnp.uint8)
    hit = (color >> 30) & 1
    img = jnp.stack([
        jnp.where(hit == 1, r, bg[0]),
        jnp.where(hit == 1, g, bg[1]),
        jnp.where(hit == 1, b, bg[2]),
    ], axis=-1)
    return img.reshape(h, w, 3)


# The frame is one big program of ~50 masked splat passes; eagerly it would
# dispatch (and on remote runtimes, compile) each scatter separately, so the
# public entry point is the jitted whole-frame render.  cfg and the geometry
# knobs are static; a `tris=None` particles-only call compiles separately.
render_particles_and_surface_jit = jax.jit(
    render_particles_and_surface,
    static_argnames=("cfg", "width", "height", "surface_subdiv",
                     "particle_radius", "max_sprite_radius",
                     "fine_tri_budget"))
