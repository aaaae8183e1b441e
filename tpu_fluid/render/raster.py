"""Host-side frame rendering through the native C++ rasterizer.

Exact-parity counterpart of the reference's raster pipelines: depth-tested
point sprites sized min(base/depth, max) drawn as circles
(`30_render_particles`), and flat Lambert-shaded marching-cubes triangles
(`31_render_surface`).  Falls back to the device splat renderer
(render/splat.py) when no C++ toolchain is available.
"""

from __future__ import annotations

import ctypes

import numpy as np

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.native import load_rasterizer


def shade_triangles(normals: np.ndarray, cfg: FluidConfig) -> np.ndarray:
    """Flat shading: ambient + max(0, dot(-L, N)) * diffuse
    (`render_surface.frag:21-26`)."""
    light = np.asarray(cfg.render_light_direction, dtype=np.float32)
    light = light / np.linalg.norm(light)
    lam = np.maximum(0.0, -(normals @ light))
    amb = np.asarray(cfg.render_surface_ambient_color, dtype=np.float32)
    dif = np.asarray(cfg.render_surface_diffuse_color, dtype=np.float32)
    return amb[None, :] + lam[:, None] * dif[None, :]


def render_frame_native(positions, active, tris, normals, mvp,
                        cfg: FluidConfig, width: int = 1024,
                        height: int = 1024):
    """positions (P,3), active (P,), tris (T,3,3), normals (T,3) — all host
    numpy.  Returns (H, W, 3) uint8 or None if the native library is
    unavailable."""
    lib = load_rasterizer()
    if lib is None:
        return None

    depth = np.empty(width * height, dtype=np.float32)
    rgb = np.empty(width * height * 3, dtype=np.uint8)
    bg = (np.asarray(cfg.background_color) * 255).astype(np.uint8)
    lib.clear_buffers(depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                      rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                      width * height, bg[0], bg[1], bg[2])

    mvp32 = np.ascontiguousarray(mvp, dtype=np.float32).reshape(16)
    fp = ctypes.POINTER(ctypes.c_float)
    u8 = ctypes.POINTER(ctypes.c_uint8)

    if tris is not None and len(tris):
        t32 = np.ascontiguousarray(tris, dtype=np.float32)
        colors = np.ascontiguousarray(shade_triangles(
            np.asarray(normals, dtype=np.float32), cfg))
        lib.rasterize_triangles(
            t32.ctypes.data_as(fp), colors.ctypes.data_as(fp),
            len(t32), mvp32.ctypes.data_as(fp), width, height,
            depth.ctypes.data_as(fp), rgb.ctypes.data_as(u8))

    if positions is not None and len(positions):
        p32 = np.ascontiguousarray(positions, dtype=np.float32)
        a8 = np.ascontiguousarray(active, dtype=np.uint8)
        col = cfg.particle_render_color
        lib.rasterize_points(
            p32.ctypes.data_as(fp), a8.ctypes.data_as(u8), len(p32),
            mvp32.ctypes.data_as(fp),
            cfg.particle_render_size, cfg.particle_render_max_size,
            col[0], col[1], col[2], width, height,
            depth.ctypes.data_as(fp), rgb.ctypes.data_as(u8))

    return rgb.reshape(height, width, 3)
