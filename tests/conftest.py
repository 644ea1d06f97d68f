"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests exercise `shard_map`/
`pjit` over 8 virtual CPU devices exactly as the driver's `dryrun_multichip` does.

Note: the environment pins ``JAX_PLATFORMS=axon`` (the TPU tunnel plugin), and the
env var alone does not override it once the plugin is registered — we must also set
``jax.config.jax_platforms`` before the backend initialises.
"""

import os

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tokensgen_tpu.utils.platform import machine_scoped_cache_dir  # noqa: E402

os.environ["JAX_PLATFORMS"] = "cpu"
# The test suite must NOT share a persistent-cache dir with the TPU-context
# tools (/tmp/tokensgen_tpu_jax_cache): XLA:CPU AOT entries embed per-context
# compile "machine features" (prefer-no-scatter/gather tuning under the TPU
# plugin), cross-context loads fail that check with an error that warns of
# SIGILL, and one such mixed-dir run segfaulted the suite inside
# backend_compile_and_load. A CPU-suffixed, machine-fingerprinted dir keeps
# test compiles isolated from tool compiles AND from other host types.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    machine_scoped_cache_dir("/tmp/tokensgen_tpu_jax_cache_cpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"

import pytest  # noqa: E402

# Heavyweight parity/oracle and end-to-end modules (measured with
# --durations on the 8-device CPU mesh; each >1.5 min aggregate). They run
# in the complete suite (plain `pytest`, ~51 min) but not the `-m quick`
# iteration gate (<10 min). Quick still smokes every subsystem: schedule,
# rope, attention, dit, fifo, data, config, tp, t2to, quant, checkpoint...
_FULL_MODULES = {
    "test_infer_cli", "test_multihost", "test_parity_reference",
    "test_pipeline_to2v", "test_sampling_modes", "test_serving",
    "test_t2to", "test_train_cli", "test_train_to2v", "test_vae3d",
    "test_vip_v4", "test_vip_variants", "test_zero",
}


def pytest_collection_modifyitems(config, items):
    """Everything not explicitly `slow`/`full` is `quick`, so `pytest -m quick`
    is the fast iteration gate and `pytest` (no -m) stays the complete suite."""
    for item in items:
        if item.module.__name__ in _FULL_MODULES:
            item.add_marker(pytest.mark.full)
        if (item.get_closest_marker("slow") is None
                and item.get_closest_marker("full") is None):
            item.add_marker(pytest.mark.quick)
