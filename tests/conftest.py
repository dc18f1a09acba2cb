"""Test configuration: run everything on CPU with 8 virtual devices.

The reference's tests require a real CUDA GPU (SURVEY.md §4); here kernel tests use
Pallas interpret mode and sharding tests use a virtual 8-device CPU mesh, so the full
suite runs anywhere.
"""

import os

# Force CPU even when the shell exports JAX_PLATFORMS=axon (real TPU): tests must
# run anywhere. Override, don't setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin in this environment ignores the JAX_PLATFORMS env var;
# the config knob does work.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", jax.default_backend()
