"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Correctness tests run in double precision on the CPU backend (TPU f64 is
emulated); sharding tests use the 8 virtual host devices. Throughput is
measured separately by bench.py on real TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import pytest

# Something in this image pins jax_platforms to "axon,cpu" regardless of the
# JAX_PLATFORMS env var; force the CPU backend for the correctness suite
# before any backend is initialized.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables and restore global config per module.

    - The full suite compiles many hundreds of distinct XLA CPU programs;
      with all of them held live in one process, jaxlib 0.9.0's CPU client
      eventually SIGSEGVs inside backend_compile_and_load (reproduced twice
      at ~38% of the suite before round 3). Dropping the pjit/compile
      caches between modules bounds the live-executable population.
    - x64 is re-asserted so a test that imports code flipping global JAX
      config (the round-2 laikago_mpc_walk example did this at import time)
      cannot silently downgrade every later module to f32.
    """
    yield
    jax.clear_caches()
    if not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)
