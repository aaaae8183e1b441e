"""tpu_fluid — a TPU-native MAC-grid + marker-particle fluid simulation
framework (JAX / XLA / Pallas), rebuilt from scratch with the capabilities of
the reference Vulkan engine (Matezzzz/vulkan-3d-fluid-simulation).

Quick start:

    from tpu_fluid import FluidConfig, initial_state, jit_step
    cfg = FluidConfig.reference_scene()
    state = initial_state(cfg)
    for _ in range(100):
        state = jit_step(state, cfg)
"""

from tpu_fluid.core.config import FluidConfig
from tpu_fluid.core.scene_fields import SceneFields
from tpu_fluid.core.state import FluidState, initial_state
from tpu_fluid.core.types import CellType
from tpu_fluid.solver.step import jit_multi_step, jit_step, simulation_step

__all__ = [
    "FluidConfig",
    "FluidState",
    "SceneFields",
    "CellType",
    "initial_state",
    "simulation_step",
    "jit_step",
    "jit_multi_step",
]
__version__ = "0.1.0"
