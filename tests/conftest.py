"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's CPU-based smoke testing strategy
(reference tests/test_train.py: world_size=0 -> device="cpu"); multi-device
sharding tests use xla_force_host_platform_device_count.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers the axon TPU backend and
# JAX_PLATFORMS=axon; the config update below is the reliable way to pin
# tests to the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
