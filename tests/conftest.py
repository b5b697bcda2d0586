"""Test configuration: CPU backend, 8 virtual devices, float64 enabled.

Numerics tests need float64 (the parity bar is 1e-8 Ha); multi-chip sharding
tests need several devices. Both are provided by the CPU backend with
virtual devices — the TPU path runs the same code in float32 for speed.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
