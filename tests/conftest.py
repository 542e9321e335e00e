"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Mirrors the reference's float64-everywhere test strategy
(`tests/test_baselaplace.py:26-27`) and adds what the reference lacks: a virtual
multi-device mesh for sharding tests (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone does not always win over an externally-registered TPU plugin
# (e.g. the axon terminal); the config update does.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
