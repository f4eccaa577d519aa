"""Test configuration: force the CPU backend (the environment's
sitecustomize pins JAX_PLATFORMS=axon for the TPU tunnel, so the env var
alone is not enough) with a virtual 8-device mesh, and enable float64 so
numerics can be checked against reference (float64) vectors.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu"
