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

# Persistent compile cache: XLA-CPU compile of 3D-conv graphs dominates
# the slow lane (measured: SECOND's train-step graph compiles in ~230 s
# cold, ~1 s warm).  Keyed by HLO hash, so correctness is unaffected;
# only entries that took >=1 s to compile are kept (~10 MB/graph).
_cache_dir = os.environ.get(
    "HMVIT_COMPILE_CACHE",
    os.path.join(os.path.dirname(__file__), os.pardir,
                 ".jax_compile_cache"))
if _cache_dir != "0":
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.devices()[0].platform == "cpu", jax.devices()
