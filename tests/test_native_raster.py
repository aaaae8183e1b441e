"""Native C++ rasterizer: build, geometry, z-buffering, sprite sizing."""

import numpy as np
import pytest

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.native import load_rasterizer
from tpu_fluid.render.camera import Camera
from tpu_fluid.render.raster import render_frame_native

CFG = FluidConfig(grid_size=(20, 20, 20))

pytestmark = pytest.mark.skipif(load_rasterizer() is None,
                                reason="no C++ toolchain")


def _cam():
    return Camera()  # reference pose looking at the 20^3 box


def test_triangle_visible_and_shaded():
    # a big triangle in front of the camera, facing it
    tris = np.array([[[5, 5, 5], [15, 5, 5], [10, 15, 5]]], dtype=np.float32)
    n = np.array([[0, 0, -1]], dtype=np.float32)
    img = render_frame_native(None, None, tris, n, _cam().mvp(), CFG,
                              256, 256)
    assert img.shape == (256, 256, 3)
    hit = (img != 0).any(axis=-1)
    assert hit.sum() > 100
    # surface color: ambient blue + diffuse green-cyan, never red-dominant
    r, g, b = img[..., 0][hit], img[..., 1][hit], img[..., 2][hit]
    assert (b > 0).all()


def test_particles_sprite_size_grows_with_proximity():
    cfg = CFG.replace(particle_render_size=120.0,
                      particle_render_max_size=40.0)
    near = np.array([[10.0, 10.0, 2.0]], dtype=np.float32)   # close to cam
    far = np.array([[10.0, 10.0, 18.0]], dtype=np.float32)
    act = np.ones(1, dtype=bool)
    img_near = render_frame_native(near, act, None, None, _cam().mvp(), cfg,
                                   256, 256)
    img_far = render_frame_native(far, act, None, None, _cam().mvp(), cfg,
                                  256, 256)
    assert (img_near[..., 0] > 0).sum() > (img_far[..., 0] > 0).sum() > 0


def test_depth_test_particle_behind_triangle():
    tris = np.array([[[0, 0, 10], [20, 0, 10], [10, 20, 10]]],
                    dtype=np.float32)
    n = np.array([[0, 0, -1]], dtype=np.float32)
    behind = np.array([[10.0, 8.0, 15.0]], dtype=np.float32)
    act = np.ones(1, dtype=bool)
    img = render_frame_native(behind, act, tris, n, _cam().mvp(), CFG,
                              256, 256)
    # the particle is occluded: no red-dominant pixels
    red = (img[..., 0] > 200) & (img[..., 1] < 50) & (img[..., 2] < 50)
    assert red.sum() == 0
    # in front: red visible
    front = np.array([[10.0, 8.0, 5.0]], dtype=np.float32)
    img2 = render_frame_native(front, act, tris, n, _cam().mvp(), CFG,
                               256, 256)
    red2 = (img2[..., 0] > 200) & (img2[..., 1] < 50)
    assert red2.sum() > 0


def test_background_color():
    cfg = CFG.replace(background_color=(0.1, 0.2, 0.3))
    img = render_frame_native(None, None, None, None, _cam().mvp(), cfg,
                              32, 32)
    assert (img[..., 0] == 25).all()
    assert (img[..., 1] == 51).all()
    assert (img[..., 2] == 76).all()
