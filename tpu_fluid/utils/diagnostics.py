"""Per-step scalar diagnostics, computed on device in one jitted pass.

The reference has no observability beyond a disabled debug draw pipeline
(SURVEY.md §5.5).  These are the invariants its physics maintains by
construction, surfaced as numbers: post-projection divergence on water cells,
cell-type census, active particle count, velocity CFL number, inertia bounds.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.core.state import FluidState
from tpu_fluid.core.types import CellType
from tpu_fluid.stages.pressure import compute_divergence


@functools.partial(jax.jit, static_argnums=1)
def _diagnostics(state: FluidState, cfg: FluidConfig):
    t = state.cell_types
    water = t == CellType.WATER
    div = compute_divergence(state.velocity)
    wdiv = jnp.where(water, jnp.abs(div), 0.0)
    nwater = water.sum()
    vmax = jnp.abs(state.velocity).max()
    pos = state.positions
    act = state.active
    return {
        "step": state.step,
        "particles_active": act.sum(),
        "particles_dropped": state.dropped,
        "cells_water": nwater,
        "cells_air": (t == CellType.AIR).sum(),
        "cells_solid": (t == CellType.SOLID).sum(),
        "div_water_max": wdiv.max(),
        "div_water_mean": wdiv.sum() / jnp.maximum(nwater, 1),
        "vel_max": vmax,
        "cfl": vmax * cfg.dt / cfg.cell_width,
        "inertia_max": state.inertia.max(),
        "pos_min": jnp.where(act[:, None], pos, jnp.inf).min(),
        "pos_max": jnp.where(act[:, None], pos, -jnp.inf).max(),
    }


def diagnostics(state: FluidState, cfg: FluidConfig) -> Dict[str, float]:
    """Host-side dict of scalars (one device->host sync)."""
    out = _diagnostics(state, cfg)
    return {k: float(v) for k, v in out.items()}


def format_diagnostics(d: Dict[str, float]) -> str:
    dropped = int(d.get("particles_dropped", 0))
    return (f"step {int(d['step']):6d}  particles {int(d['particles_active'])}"
            + (f" (dropped {dropped})" if dropped else "")
            + f"  water {int(d['cells_water'])}  air {int(d['cells_air'])}"
            f"  |div| mean {d['div_water_mean']:.2e} max {d['div_water_max']:.2e}"
            f"  CFL {d['cfl']:.3f}  pos [{d['pos_min']:.2f},{d['pos_max']:.2f}]")
