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


# The grid_fused kernels hold three x-slab rows of every field in VMEM at
# once; past this y*z plane size the slabs exceed the VMEM model's budget
# (96 KiB/row/field at f32 -> ~4.5 MiB of live rows at the limit).
_FUSE_GRID_MAX_PLANE = 98304


def fuse_grid_choice(cfg, scene=None) -> bool:
    """Single gate for the fused 02-06/08-11/13 grid kernels
    (kernels/grid_fused.py), shared by solver/step.py and
    parallel/spmd_step.py so the two paths can never silently fork.

    Conditions: Pallas is on, the config opts in, stage 09 is the
    reference's no-op (the fused kernel doesn't implement real diffusion),
    no dynamic scene fields (the kernel has no solid/force inputs), and the
    y*z plane fits the kernels' VMEM model.  The SPMD caller additionally
    requires a local slab of >= 2 rows (its 2-wide halo plumbing needs a
    non-degenerate interior) — that extra condition stays at its call site.
    """
    use_pallas, _ = pallas_choice(cfg)
    return (use_pallas and cfg.grid_fused
            and cfg.reference_diffuse_noop and scene is None
            and cfg.grid_size[1] * cfg.grid_size[2] <= _FUSE_GRID_MAX_PLANE)
