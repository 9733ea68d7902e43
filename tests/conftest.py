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

# Compilation in this environment is slow (~5s wall per executable); a
# persistent cache makes repeat test runs cheap.
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="session")
def fixtures_dir():
    return FIXTURES


def load_fixture(name):
    return dict(np.load(os.path.join(FIXTURES, name)))
