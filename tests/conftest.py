"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding logic runs without TPU hardware (SURVEY.md §4 consequence row).

Note: the environment preloads jax with a remote-TPU backend (JAX_PLATFORMS
is already set and jax is imported by sitecustomize), so we must override via
jax.config *before any backend is initialized*, not via os.environ defaults.
"""

import os

# Must be set before the CPU client is created (read at backend init).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (already imported by sitecustomize; config still mutable)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache: the big fused pipeline programs take 30-90 s
# each to compile on the CPU backend and dominate suite wall-clock; caching
# them across runs cuts repeat suites by minutes (first run pays once).
_cache = os.path.join(os.path.dirname(__file__), os.pardir,
                      ".jax_cache_tests")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the virtual CPU mesh, got %s" % jax.devices())
    assert len(jax.devices()) == 8
