"""Test configuration: run everything on CPU with 8 virtual devices.

This is the TPU-idiomatic substitute for a fake distributed backend
(SURVEY.md §4): pjit/mesh code is exercised against 8 XLA host devices via
``--xla_force_host_platform_device_count`` so multi-chip sharding logic is
tested without TPU hardware. Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
