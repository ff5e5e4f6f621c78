"""Test config: force CPU platform with 8 virtual devices so multi-chip
sharding tests run anywhere (the qemu-user analog of the reference's CI,
ref: tests/autotest/conftest.py + ci_trigger_test.sh)."""

import os
import sys

# Force CPU regardless of ambient JAX_PLATFORMS (e.g. the axon TPU tunnel):
# unit tests must be fast and deterministic; TPU execution is exercised by
# bench.py / examples on real hardware.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# If a pytest plugin imported jax before this conftest ran, the env var was
# read too late — force the config directly as well.
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
