"""Test configuration: force JAX onto a virtual 8-device CPU platform so the
suite runs anywhere (and so sharding tests get a real multi-device mesh)
before any jax import happens."""

import os

if os.environ.get("TPU_FLUID_TPU_TESTS"):
    # run against real hardware (tests/tpu); leave the platform alone
    import jax  # noqa: F401
else:
    os.environ["JAX_PLATFORMS"] = "cpu"  # override even if the env says TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Some environments pin jax_platforms at import time (overriding the env
# var); force CPU through the config API before any backend initializes.
import jax  # noqa: E402

if not os.environ.get("TPU_FLUID_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")
