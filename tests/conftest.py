"""Test configuration: force an 8-device virtual CPU platform.

All tests run on CPU with 8 virtual devices so multi-chip sharding paths
(mesh/pjit/shard_map) are exercised without TPU hardware, per SURVEY.md §4.
The driver environment pins ``JAX_PLATFORMS`` to the TPU plugin, so the env
var alone is not enough — we also update the jax config directly.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache for the compile-heavy (slow) tier: repeat
# runs of identical test programs load executables instead of recompiling
# (VERDICT r4 weak #2 — the tier must be cheap enough that it gets run).
# Explicit dir: the default tags by the ambient tunnel env, but tests are
# pinned to the 8-device virtual CPU platform regardless.
from gif_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache(
    os.path.join(
        os.path.expanduser("~"), ".cache", "gif_tpu", "xla", "test-cpu8"
    )
)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
