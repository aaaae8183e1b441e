"""Sharded simulation step (GSPMD path).

`sharded_step(mesh, cfg)` returns a jitted step whose inputs/outputs carry
the canonical x-slab shardings of parallel/mesh.py.  XLA partitions the
single-program step: radius-R stencils (Jacobi, blur, shift-select advection)
become slab computations with R-cell halo exchanges over ICI; the particle
histogram's scatter-add becomes a local scatter + `psum`-style combine; the
packed-table row gather becomes an all-gather of the (small) velocity table
or an index-routed gather, whichever the partitioner picks.

tests/test_sharding.py asserts sharded == single-device bitwise-or-tight on
an 8-way virtual CPU mesh.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.parallel.mesh import state_shardings
from tpu_fluid.solver.step import simulation_step


def sharded_step(mesh: Mesh, cfg: FluidConfig, donate: bool = True):
    """A jitted step function with explicit input/output shardings."""
    sh = state_shardings(mesh)
    return jax.jit(
        functools.partial(simulation_step, cfg=cfg),
        in_shardings=(sh,),
        out_shardings=sh,
        donate_argnums=(0,) if donate else (),
    )


def sharded_multi_step(mesh: Mesh, cfg: FluidConfig, n_steps: int):
    sh = state_shardings(mesh)

    def body(state):
        def one(s, _):
            return simulation_step(s, cfg), None
        out, _ = jax.lax.scan(one, state, None, length=n_steps)
        return out

    return jax.jit(body, in_shardings=(sh,), out_shardings=sh,
                   donate_argnums=(0,))
