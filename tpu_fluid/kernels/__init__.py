"""Pallas (Mosaic) kernels for the hot pipeline stages.

`pallas_choice(cfg)` is the single dispatch rule every stage uses to decide
between its Pallas kernel and its XLA formulation, honoring
`cfg.pallas_mode` ("auto" picks Pallas exactly on TPU backends; "interpret"
runs the same kernels through the Pallas interpreter so CPU-mesh sharding
tests exercise the real TPU code paths).
"""

from __future__ import annotations


def pallas_choice(cfg) -> tuple[bool, bool]:
    """Returns (use_pallas, interpret) for this config."""
    mode = getattr(cfg, "pallas_mode", "auto")
    if mode == "on":
        return True, False
    if mode == "interpret":
        return True, True
    if mode == "off":
        return False, False
    import jax
    return jax.default_backend() == "tpu", False
