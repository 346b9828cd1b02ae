"""Test configuration.

The suite runs JAX on CPU with 8 virtual devices so that sharding/pjit paths
are exercised without TPU hardware (the driver separately dry-runs the
multi-chip path and benches on the real chip).

Note: this machine's sitecustomize registers the experimental `axon` TPU
platform and forces ``jax_platforms=axon,cpu`` (jax is already imported at
interpreter start), so we must override via ``jax.config.update`` — the
backend itself initializes lazily, which also means XLA_FLAGS set here is
still honored.
"""

import os
import sys

if os.environ.get("SYNTH_TPU_HIDE_AUDIOOP"):
    # Python 3.13 removed the audioop stdlib module.  This mode simulates
    # that world: goldref's audioop-conformance suite must skip cleanly
    # (goldref then IS the spec) and everything else must stay green.
    class _BlockAudioop:
        def find_spec(self, name, path=None, target=None):
            if name == "audioop":
                raise ImportError(
                    "audioop hidden (SYNTH_TPU_HIDE_AUDIOOP=1 simulates "
                    "Python 3.13 where the module is removed)")
            return None

    sys.modules.pop("audioop", None)
    sys.meta_path.insert(0, _BlockAudioop())

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu"


@pytest.fixture
def rng():
    return np.random.default_rng(0xC0FFEE)
