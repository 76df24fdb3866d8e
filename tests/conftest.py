"""Test harness: force an 8-device virtual CPU mesh.

The multi-device analog of the reference's Python rank simulator
(python/conflux.py simulates all P MPI ranks in one numpy process): we run the
real shard_map SPMD programs on 8 virtual CPU devices via
--xla_force_host_platform_device_count, so distributed semantics are tested
without TPU hardware (SURVEY.md §4).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

# The container sitecustomize registers the axon TPU PJRT plugin and sets
# JAX_PLATFORMS=axon before pytest starts; override via config (env is too late).
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _devices():
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(42)
