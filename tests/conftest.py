"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-world analog of a fake backend (SURVEY.md §4): sharding,
collectives and pjit compile+execute on 8 host-platform devices without TPU
hardware.

Note: the environment's axon sitecustomize force-registers the TPU plugin and
sets jax_platforms='axon,cpu' at interpreter start, so the JAX_PLATFORMS env
var alone is NOT enough — we must override via jax.config after import (but
before any backend initializes). XLA_FLAGS must be set before jax import.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# Modules dominated by full-pipeline XLA compiles (minutes each on CPU).
# Fast feedback loop: `pytest -m "not slow"` (~3 min); full suite for CI.
_SLOW_MODULES = {
    "test_pipelines", "test_pipelines_modes", "test_kd_train",
    "test_kd_sd15", "test_trainer", "test_mul_zh", "test_flash_vjp",
    "test_onepass_attention",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: full-pipeline compile tests (minutes on CPU)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
