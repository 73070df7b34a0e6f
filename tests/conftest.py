"""Test configuration: run everything on CPU with 8 virtual devices.

This is the TPU-idiomatic substitute for a fake distributed backend
(SURVEY.md §4): pjit/mesh code is exercised against 8 XLA host devices via
``--xla_force_host_platform_device_count`` so multi-chip sharding logic is
tested without TPU hardware.

NOTE: the environment may pre-set JAX_PLATFORMS to a hardware plugin (e.g.
``axon``); both the env var and jax.config must be overridden here, before
any test imports jax, or the whole suite silently runs on the TPU tunnel
with TPU default (bf16) matmul precision.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
