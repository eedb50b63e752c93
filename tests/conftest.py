"""Test configuration: force an 8-device virtual CPU mesh.

The surrounding environment's sitecustomize registers a real-TPU ("axon")
backend and sets ``jax_platforms`` via ``jax.config`` at interpreter start,
which overrides the JAX_PLATFORMS env var — so we must override through
``jax.config`` too, before any backend initializes.  Tests must be fast,
local, and deterministic on the virtual mesh.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()
