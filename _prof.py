import jax, time
import jax.numpy as jnp
from tpu_fluid.core.config import FluidConfig
from tpu_fluid.core.state import initial_state
from tpu_fluid.solver.step import simulation_step
from tpu_fluid.utils.profiling import print_breakdown, time_chained, _fetch
from tpu_fluid.stages import surface_fields

cfg = FluidConfig.scaled_scene(128, particle_count=1_000_000,
                               jacobi_iters=200)
print_breakdown(cfg, n=10)

state = initial_state(cfg)
stepf = jax.jit(simulation_step, static_argnums=1)
for _ in range(3):
    state = stepf(state, cfg)
_fetch(state)
types = state.cell_types
def surf_fused(f2):
    occ = (f2 > 0).astype(jnp.uint8)
    inertia, f1, f2b = surface_fields.update_surface_fields(
        types, occ, state.inertia, f2, cfg)
    return f2b + 1e-30*(f1.sum() + inertia.sum())
print("fused 16-18 dispatcher:",
      time_chained(surf_fused, state.float_dens_2, n=10), "ms")
