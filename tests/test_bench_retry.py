"""bench.py transient-failure retry chain.

The driver runs `python bench.py` at round end; the TPU tunnel has
measured multi-minute UNAVAILABLE windows, so bench retries failed
attempts in a FRESH interpreter (jax caches a failed backend init for the
process lifetime) with exponential backoff.  Forcing a fast-failing
backend (JAX_PLATFORMS names a platform that is never registered)
exercises the whole chain end-to-end: N attempts, execve re-entry, env
propagation, final non-zero exit.
"""

import os
import re
import subprocess
import sys

BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")


def test_retry_chain_exhausts_attempts_and_fails():
    env = {k: v for k, v in os.environ.items()
           if k != "PALLAS_AXON_POOL_IPS"}   # no axon register -> fast fail
    env.update(JAX_PLATFORMS="axon",         # pinned, never registered
               TPU_FLUID_BENCH_ATTEMPTS="3",
               TPU_FLUID_BENCH_BACKOFF="1",
               TPU_FLUID_BENCH_GRID="8",
               TPU_FLUID_BENCH_PARTICLES="64",
               TPU_FLUID_BENCH_STEPS="2")
    r = subprocess.run([sys.executable, BENCH], env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode != 0
    retries = re.findall(r"bench: attempt failed .*retrying in (\d+)s",
                         r.stderr)
    # 3 attempts = 2 retry announcements, with doubling backoff 1s -> 2s
    assert retries == ["1", "2"], r.stderr
    assert "Unable to initialize backend" in r.stderr


def test_bench_set_overrides_typed():
    # TPU_FLUID_BENCH_SET coerces from the field's current value and
    # fails loudly on a bad key (silently benching the default config
    # would let a typo'd probe masquerade as a variant measurement)
    import importlib.util
    import pytest
    from tpu_fluid.core.config import FluidConfig

    spec = importlib.util.spec_from_file_location("bench_mod", BENCH)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    cfg = FluidConfig.scaled_scene(16)
    out, applied = bench._apply_overrides(
        cfg, "grid_fused=true,jacobi_iters=7,gravity=9.81")
    assert out.grid_fused is True
    assert out.jacobi_iters == 7
    assert out.gravity == 9.81
    assert [k for k, _ in applied] == ["grid_fused", "jacobi_iters",
                                       "gravity"]
    same, none_applied = bench._apply_overrides(cfg, "")
    assert same == cfg and none_applied == []
    with pytest.raises(AttributeError):
        bench._apply_overrides(cfg, "not_a_field=1")
    # ADVICE r4: a typo'd bool value must raise, not silently become False
    with pytest.raises(ValueError):
        bench._apply_overrides(cfg, "grid_fused=ture")
    off, _ = bench._apply_overrides(cfg, "grid_fused=no")
    assert off.grid_fused is False
