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

# Something in this image pins jax_platforms to "axon,cpu" regardless of the
# JAX_PLATFORMS env var; force the CPU backend for the correctness suite
# before any backend is initialized.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
