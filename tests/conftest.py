"""Test configuration: run every test on a virtual 8-device CPU mesh.

Sharding/pjit paths are validated without TPU hardware the standard way:
JAX_PLATFORMS=cpu + xla_force_host_platform_device_count=8.  Must be set
before jax initializes, hence the env mutation at module import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
