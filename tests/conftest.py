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


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the virtual CPU mesh, got %s" % jax.devices())
    assert len(jax.devices()) == 8
