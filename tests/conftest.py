"""Test configuration: force an 8-virtual-device CPU platform so tests are
hermetic and sharding tests run without TPU hardware.

Note: this environment injects an `axon` TPU PJRT plugin through a
sitecustomize that runs at interpreter start and overrides JAX_PLATFORMS,
so the env var alone is NOT enough — jax.config must be updated after
import (before any backend initialization)."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", jax.devices()
