"""Test configuration: run JAX on CPU with 8 virtual devices so sharding
tests work without TPU hardware (SURVEY.md §4.9)."""

import os

# Force CPU: the session env may point JAX_PLATFORMS at a TPU tunnel, but
# tests must run on the virtual CPU mesh.  jax may already be imported by the
# interpreter's startup hooks, so set the config directly as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.device_count() >= 8, "virtual CPU mesh not active"
