"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on the CPU backend with 8 virtual devices so data-parallel /
sharding logic is exercised without TPU hardware (SURVEY.md §4d).

The sandbox presets JAX_PLATFORMS=axon (the TPU tunnel) and a site hook
re-appends it, so the env var alone is not enough — we also update the jax
config, which takes precedence. XLA_FLAGS must be set before the backend
initialises.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
