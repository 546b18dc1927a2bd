"""Test configuration.

Tests run on a virtual 8-device CPU mesh with float64 enabled so kernel
values can be checked against high-precision host references.  Production
TPU runs use float32 (the kernels are dtype-polymorphic).
"""
import os

# Must be set before JAX initializes its backends.  NOTE: the axon TPU
# environment pre-registers its backend via sitecustomize and pins
# JAX_PLATFORMS=axon, so the env var alone is not enough - the config
# update below is what actually forces CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
