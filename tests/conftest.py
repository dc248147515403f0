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
    """Release compiled executables after each test module.

    The full suite compiles many hundreds of distinct XLA CPU programs; with
    all of them held live in one process, jaxlib 0.9.0's CPU client
    eventually SIGSEGVs inside backend_compile_and_load (reproduced twice at
    ~38% of the suite). Dropping the pjit/compile caches between modules
    keeps the live-executable population bounded at one module's worth.
    """
    yield
    jax.clear_caches()
