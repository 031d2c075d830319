"""Test config: force a real CPU platform with 8 virtual devices.

CRITICAL: the container's sitecustomize (PYTHONPATH=/root/.axon_site)
registers the axon TPU-tunnel PJRT plugin at interpreter start and
overrides JAX_PLATFORMS — env vars alone do NOT give you CPU.  The only
in-process override that works is jax.config.update('jax_platforms',
'cpu') before any computation runs.  Without it, every test compile goes
through the remote TPU tunnel (minutes per compile, bf16 f32 matmuls).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the suite's big compiles (train steps, NMS
# while-loops) dominate cold runtime; repeat runs load XLA:CPU AOT results
# instead (same mechanism __graft_entry__'s dryrun uses)
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_dana_tests"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _fresh_cfg():
    """Reset the global config around every test."""
    from dana_tpu.utils.config import reset_cfg
    from dana_tpu.data import blob
    reset_cfg()
    blob.clear_image_cache()   # tests may reuse a path with new pixels
    yield
    reset_cfg()
    blob.clear_image_cache()
