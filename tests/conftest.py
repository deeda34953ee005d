"""Test configuration: force CPU with 8 virtual devices so sharding tests
run anywhere (no TPU required), per the project testing strategy."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment's sitecustomize registers a TPU backend and pins
# jax_platforms to it; force CPU for hermetic, multi-device-virtualized
# tests (the bench runs on the real chip instead).
jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pytest

# Smoke tier: `-m "not slow"` (~3 min) for quick iteration. The FULL
# suite (~10 min on this 1-core box) stays authoritative — round-8's
# three stale gate-tests were only caught by full runs. These modules
# are the measured heavy hitters (kernel A/B sweeps, sharded smoothing);
# every decode feature keeps smoke coverage through its own test file.
_SLOW_MODULES = {
    "test_pretiled",
    "test_shift_compact",
    "test_sharding",
    "test_smoothing",
    "test_smoothing_f64",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
