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


#: Every compiled XLA CPU executable holds several memory mappings; the
#: full suite compiles thousands of programs in ONE process and marches
#: into the kernel's vm.max_map_count (65530 default) — at ~65k maps the
#: next LLVM mmap fails and the process SEGFAULTS mid-compile (measured:
#: maps grow ~linearly to 65.1k right before the crash).  Dropping the
#: jit caches every few hundred tests unmaps retired executables; the
#: handful of cross-module programs recompile (~seconds), keeping the
#: map count bounded far below the limit.
_TESTS_PER_CACHE_CLEAR = 150
_test_counter = 0


def pytest_runtest_teardown(item, nextitem):
    global _test_counter
    _test_counter += 1
    if _test_counter % _TESTS_PER_CACHE_CLEAR == 0:
        jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0xC0FFEE)
