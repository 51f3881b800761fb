"""Test configuration: run every test on a virtual 8-device CPU mesh.

Sharding/pjit paths are validated without TPU hardware the standard way:
force the CPU platform + xla_force_host_platform_device_count=8.  The axon
TPU plugin in this image ignores the JAX_PLATFORMS env var, so the platform
is forced through jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test")
