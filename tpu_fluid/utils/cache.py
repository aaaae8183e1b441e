"""Persistent XLA compilation cache.

First compiles of the big programs (the 19-stage step, the scan-of-K
multi-step, the render chain) cost 20-40 s EACH on a remote-compile TPU
runtime — a cold `tpu-fluid --grid 128 --steps 300 --frame-every 100` paid
~420 s of compiles vs ~25 s of simulation.  JAX's persistent cache stores
the serialized executables keyed by HLO, so every later process (CLI runs,
bench runs, notebooks) loads them in ~1 s (measured 6.3 s -> 1.5 s for a
small probe; the render chain 326 s -> ~2 s).

The reference app has the same concern solved the same way: Vulkan pipeline
caches / precompiled SPIR-V (its shaders are compiled once at build time,
`shaders.mk` analogue).  Enabled by the CLI and bench entry points; library
users opt in by calling enable_compilation_cache() themselves.

Env knobs: TPU_FLUID_CACHE_DIR (location), TPU_FLUID_NO_CACHE=1 (disable).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at `path` (default
    ~/.cache/tpu_fluid/xla, overridable via TPU_FLUID_CACHE_DIR).  Returns
    the cache dir, or None when disabled via TPU_FLUID_NO_CACHE=1."""
    if os.environ.get("TPU_FLUID_NO_CACHE"):
        return None
    import jax
    path = (path or os.environ.get("TPU_FLUID_CACHE_DIR")
            or os.path.join(os.path.expanduser("~"), ".cache", "tpu_fluid",
                            "xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that took a nontrivial compile (the default 1 s
    # threshold skips tiny jits, which is fine)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
