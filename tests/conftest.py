"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPU hardware via
xla_force_host_platform_device_count (SURVEY.md §4 test strategy).

This environment force-registers a TPU PJRT plugin from sitecustomize before
conftest runs, so plain JAX_PLATFORMS=cpu is not enough: we flip the config
and drop the tpu backend factory before any backend initializes. Also keeps
tests fast (the TPU tunnel takes minutes to connect) and float32-exact
(TPU matmuls default to bf16).
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running tier (CLI subprocess trainings, e2e optimization"
        " loops, multi-process clusters); run `pytest -m 'not slow'` for the"
        " fast default tier")
