"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
logic is exercised without TPU hardware (the driver separately dry-runs the
multi-chip path)."""
import os
import sys

# Force CPU even when a TPU plugin is site-registered. jax may already be
# imported by sitecustomize, so setting os.environ alone is too late — update
# jax.config directly (backends are still uninitialised at conftest time).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
