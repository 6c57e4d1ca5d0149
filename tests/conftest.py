"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The driver benches on real TPU; tests validate numerics + sharding on host
(multi-chip hardware is not available in this environment).  The driver env
pins JAX_PLATFORMS to the TPU tunnel, so override it here unless the user
asks for a specific platform via OMM_TEST_PLATFORM.
"""
import os

platform = os.environ.get("OMM_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize registers (and pins) the TPU-tunnel
# backend at interpreter start, so the env var alone is too late — force
# the platform through the config API as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", platform)
