"""Test configuration.

The suite runs JAX on CPU with 8 virtual devices so that sharding/pjit paths
are exercised without TPU hardware (the driver separately dry-runs the
multi-chip path and benches on the real chip).  The env vars must be set
before jax is imported anywhere.
"""

import os
import sys

if "jax" not in sys.modules:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0xC0FFEE)
