"""Test harness: run everything on a virtual 8-device CPU mesh.

In this image the axon TPU plugin overrides the JAX_PLATFORMS env var, so
the backend must be forced through jax.config *before* first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert len(jax.devices()) == 8, (
    "tests need the 8-device virtual CPU mesh; got "
    f"{jax.devices()}")
