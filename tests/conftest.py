"""Test config: force an 8-virtual-device CPU platform BEFORE jax initializes
so sharding tests run without TPU hardware."""

import os

# The container exports JAX_PLATFORMS=axon (the TPU tunnel); tests must
# run on CPU, so force-override rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _fresh_cfg():
    """Reset the global config around every test."""
    from dana_tpu.utils.config import reset_cfg
    reset_cfg()
    yield
    reset_cfg()
