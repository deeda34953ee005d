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
