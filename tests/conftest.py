"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests run without TPU hardware. Must run before jax is imported anywhere."""
import os

# Force, don't setdefault: the surrounding environment presets
# JAX_PLATFORMS to the TPU tunnel, and unit tests must be hermetic.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
