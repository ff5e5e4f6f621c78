"""Test config: force CPU platform with 8 virtual devices so multi-chip
sharding tests run anywhere (the qemu-user analog of the reference's CI,
ref: tests/autotest/conftest.py + ci_trigger_test.sh)."""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
