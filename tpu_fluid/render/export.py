"""Host-side exporters: PNG frames, OBJ/PLY meshes, particle clouds.

The reference presents to a GLFW swapchain (`main.cpp:209`); headless TPU
rendering dumps frames and meshes to disk instead.
"""

from __future__ import annotations

import os

import numpy as np


def write_png(path: str, image) -> None:
    """image: (H, W, 3) uint8."""
    from PIL import Image
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(np.asarray(image), mode="RGB").save(path)


def write_obj(path: str, tris, normals=None) -> None:
    """Triangle soup (T,3,3) -> Wavefront OBJ (flat normals optional)."""
    tris = np.asarray(tris)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("# tpu_fluid surface mesh\n")
        for t in tris:
            for v in t:
                f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        if normals is not None:
            for n in np.asarray(normals):
                f.write(f"vn {n[0]:.6f} {n[1]:.6f} {n[2]:.6f}\n")
        for i in range(len(tris)):
            a, b, c = 3 * i + 1, 3 * i + 2, 3 * i + 3
            if normals is not None:
                f.write(f"f {a}//{i+1} {b}//{i+1} {c}//{i+1}\n")
            else:
                f.write(f"f {a} {b} {c}\n")


def write_ply(path: str, tris) -> None:
    """Binary-less ASCII PLY triangle soup."""
    tris = np.asarray(tris, dtype=np.float32)
    nv = tris.shape[0] * 3
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {nv}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {tris.shape[0]}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for t in tris:
            for v in t:
                f.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for i in range(tris.shape[0]):
            f.write(f"3 {3*i} {3*i+1} {3*i+2}\n")


def write_gif(path: str, frames, fps: int = 20) -> None:
    """Assemble (H, W, 3) uint8 frames into an animated GIF — the headless
    counterpart of the reference's real-time window."""
    from PIL import Image
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imgs = [Image.fromarray(np.asarray(f), mode="RGB") for f in frames]
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=max(1, 1000 // fps), loop=0)


def write_mp4(path: str, frames, fps: int = 25) -> None:
    """Assemble (H, W, 3) uint8 RGB frames into an mp4 (OpenCV mp4v codec —
    this zero-egress image has no ffmpeg binary)."""
    import cv2
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    f0 = np.asarray(frames[0])
    h, w = f0.shape[:2]
    out = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                          float(fps), (w, h))
    if not out.isOpened():
        raise RuntimeError(f"cv2.VideoWriter could not open {path}")
    for f in frames:
        out.write(np.asarray(f)[:, :, ::-1])   # RGB -> BGR
    out.release()


def write_video(path: str, frames, fps: int = 25) -> None:
    """Dispatch on extension: .mp4 via OpenCV, anything else animated GIF."""
    if path.lower().endswith(".mp4"):
        write_mp4(path, frames, fps=fps)
    else:
        write_gif(path, frames, fps=fps)


def write_particles_csv(path: str, positions, active) -> None:
    pos = np.asarray(positions)[np.asarray(active)]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savetxt(path, pos, fmt="%.6f", delimiter=",", header="x,y,z")
