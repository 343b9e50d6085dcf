"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the fake-backend capability the reference lacks (SURVEY.md §4):
multi-chip sharding logic is exercised on host CPU via
--xla_force_host_platform_device_count, no TPU pod required.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon boot hook registers the TPU backend and pins jax_platforms before
# env vars are read; override at the config level (backends are lazy).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "reference_grids.npz")


@pytest.fixture(scope="session")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden fixtures not generated")
    return np.load(GOLDEN)


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
