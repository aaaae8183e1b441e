"""Device mesh + sharding specs for multi-chip runs.

The reference is single-GPU (SURVEY.md §2.6); scaling there means editing
compile-time constants.  Here large grids shard over a 1-D mesh by spatial
domain decomposition: x-slabs of every 3-D field, particles by index.  The
step function itself is unchanged — XLA's SPMD partitioner (GSPMD) derives
the halo exchanges for every stencil/pad/slice pattern and the collectives
for the particle scatter, riding ICI.  This is the TPU-native replacement
for the NCCL/MPI layer the reference never had.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import AxisType, Mesh, NamedSharding, PartitionSpec as P

from tpu_fluid.core.state import FluidState

AXIS = "x"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D device mesh with an Auto axis: the step stays a single program and
    XLA's SPMD partitioner (GSPMD) derives halo exchanges and collectives
    (JAX >= 0.9 defaults to explicit sharding-in-types, under which stencil
    pads on sharded dims are unimplemented — Auto restores GSPMD)."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devs)} device(s) are visible "
                f"({[d.platform for d in devs]}); for a virtual CPU mesh "
                f"set JAX_PLATFORMS=cpu and "
                f"XLA_FLAGS=--xla_force_host_platform_device_count=N")
        devs = devs[:n_devices]
    return jax.make_mesh((len(devs),), (AXIS,), devices=devs,
                         axis_types=(AxisType.Auto,))


def state_pspecs() -> FluidState:
    """PartitionSpec per state leaf: 3-D fields split along their first
    spatial axis (x-slabs), particles split by index, step replicated."""
    return FluidState(
        velocity=P(None, AXIS),      # (3, X, Y, Z) -> split X
        cell_types=P(AXIS),          # (X, Y, Z)
        inertia=P(AXIS),             # detailed grid
        float_dens_1=P(AXIS),
        float_dens_2=P(AXIS),
        positions=P(AXIS),           # (P, 3) -> split particle index
        active=P(AXIS),
        detailed_occ=P(AXIS),
        step=P(),
        dropped=P(),
    )


def state_shardings(mesh: Mesh) -> FluidState:
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec),
                        state_pspecs(),
                        is_leaf=lambda x: isinstance(x, P))


def shard_state(state: FluidState, mesh: Mesh) -> FluidState:
    """Place an (unsharded) state onto the mesh with the canonical layout."""
    return jax.device_put(state, state_shardings(mesh))
