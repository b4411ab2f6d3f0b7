"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference exercises its threaded paths with a 2-thread executor
(mahalanobis tests/simple_optimization_test.cc:109-113); here the analogous
multi-"device" coverage comes from XLA's virtual host devices — the same
shard_map/psum code path that runs over ICI on a real pod slice.

Must run before any JAX backend initialization, hence the env mutation at
module import time (pytest imports conftest before test modules).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

# The container's sitecustomize force-registers the single-chip 'axon' TPU
# platform; tests want the 8-device virtual CPU topology instead.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# Float64 for test oracles (finite differences, reference formulas). Device
# code paths pick their dtype explicitly (minimizers default to float32), so
# this only upgrades the *oracle* precision, mirroring the reference's
# f32-evaluate / f64-check split.
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture(scope="module")
def rng(request):
    """Per-module deterministic RNG. Module scope (not session): a session
    stream makes every test's data depend on which OTHER files ran before
    it, so adding a test file silently reseeds unrelated tests (this broke
    test_lm when test_batched was added). Seeding by module name keeps each
    file's draws stable regardless of what else is collected."""
    import zlib

    seed = zlib.crc32(request.module.__name__.encode())
    return np.random.default_rng(seed)
