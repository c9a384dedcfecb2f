"""Test environment: 8 virtual CPU devices for mesh/collective tests.

SURVEY.md §4.2 "Multi-node without a cluster": an
``--xla_force_host_platform_device_count=8`` CPU mesh stands in for a pod
slice; sharded-vs-replicated equivalence tests validate the collective
paths.  Must run before any ``import jax`` in test modules — conftest is
imported first by pytest.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# This machine's sitecustomize registers the axon TPU plugin and force-sets
# jax_platforms="axon,cpu", overriding the env var — override it back so the
# test suite runs on the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
