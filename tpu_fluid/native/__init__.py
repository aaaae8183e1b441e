"""Native (C++) components, loaded via ctypes.

The shared library is built on demand from the checked-in sources with g++
(no pybind11 in the environment; the C ABI + ctypes keeps the binding layer
dependency-free).  `load_rasterizer()` returns None if no compiler is
available, and callers fall back to the device splat renderer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "rasterizer.cpp")
_LIB = os.path.join(_DIR, "librasterizer.so")

_cached = None
_failed = False


def build_library(force: bool = False) -> str:
    """Compile rasterizer.cpp -> librasterizer.so (mtime-cached, like the
    reference's shader build script `shaders_fluid/build_shaders.py:14-29`)."""
    if (not force and os.path.exists(_LIB)
            and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
        return _LIB
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
         _SRC, "-o", _LIB],
        check=True, capture_output=True)
    return _LIB


def load_rasterizer():
    """ctypes handle with argtypes configured, or None if unavailable."""
    global _cached, _failed
    if _cached is not None:
        return _cached
    if _failed:
        return None
    try:
        lib = ctypes.CDLL(build_library())
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        _failed = True
        return None
    c_fp = ctypes.POINTER(ctypes.c_float)
    c_u8 = ctypes.POINTER(ctypes.c_uint8)
    lib.rasterize_triangles.argtypes = [
        c_fp, c_fp, ctypes.c_long, c_fp, ctypes.c_int, ctypes.c_int,
        c_fp, c_u8]
    lib.rasterize_points.argtypes = [
        c_fp, c_u8, ctypes.c_long, c_fp, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int, ctypes.c_int, c_fp, c_u8]
    lib.clear_buffers.argtypes = [
        c_fp, c_u8, ctypes.c_long,
        ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8]
    _cached = lib
    return lib
