"""Test configuration: run everything on CPU with an 8-device virtual mesh.

Mirrors SURVEY.md §4's strategy: kernels get shape/golden tests on CPU;
pjit/collective tests run on xla_force_host_platform_device_count=8 without
real TPUs.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
