"""Test configuration: run JAX on 8 virtual CPU devices.

Multi-device sharding tests use a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), the standard way to
test pjit/shard_map layouts without real multi-chip hardware. Must be set
before jax initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
