"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

This is the TPU-native answer to "test multi-chip without a cluster"
(SURVEY.md §4): all tests run on CPU with 8 virtual devices so sharding
tests exercise real collectives.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The axon TPU plugin overrides the JAX_PLATFORMS env var; the config update is
# what actually forces the CPU backend (with the 8 virtual devices from
# XLA_FLAGS above).
jax.config.update("jax_platforms", "cpu")

# Compilation in this environment is slow (~5s wall per executable); a
# persistent cache makes repeat test runs cheap.
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
# Full-precision matmul/conv for parity tests: the default precision lowers
# f32 convs to a faster reduced-precision path (~1e-3 rel error vs torch).
jax.config.update("jax_default_matmul_precision", "float32")

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="session")
def fixtures_dir():
    return FIXTURES


def load_fixture(name):
    return dict(np.load(os.path.join(FIXTURES, name)))


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running zoo sweeps / e2e trainings (deselect with -m 'not slow' "
        "for the <5-min fast tier)")
