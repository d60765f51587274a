"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analogue of a fake distributed backend (SURVEY.md §4):
multi-chip sharding paths are exercised with
``--xla_force_host_platform_device_count=8`` without real hardware.
Must run before the first ``import jax`` anywhere in the test process.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env may pin a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The session env may pin the axon TPU platform in a way that overrides
# JAX_PLATFORMS; the config flag takes precedence as long as no backend has
# been initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

assert jax.device_count() == 8, f"expected 8 virtual CPU devices, got {jax.devices()}"
