"""Test config: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the remote `axon` TPU PJRT plugin and
forces jax_platforms to "axon,cpu" (per-op dispatch goes over a network
tunnel - unusable for unit tests).  We flip the config back to CPU and force
8 virtual host devices BEFORE the backend initializes.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.default_backend() == "cpu", (
        "unit tests must run on the virtual CPU mesh, not the axon tunnel")
    assert jax.device_count() == 8
