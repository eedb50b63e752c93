"""Test configuration: force an 8-device virtual CPU mesh before jax imports."""

import os

# Force CPU: the surrounding environment may preset JAX_PLATFORMS to a real
# TPU; tests must be fast, local, and deterministic on the virtual mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
