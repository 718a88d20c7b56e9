"""Test configuration: run everything on CPU with an 8-device virtual mesh.

Mirrors SURVEY.md §4's strategy: kernels get shape/golden tests on CPU;
pjit/collective tests run on xla_force_host_platform_device_count=8 without
real TPUs.

Note: this terminal's sitecustomize registers the 'axon' TPU plugin and
force-sets jax_platforms at interpreter start, so the env vars alone are not
enough — the config override below (before any backend is initialized) is
what actually selects CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge as _xb  # noqa: E402

if _xb.backends_are_initialized():  # pragma: no cover
    from jax.extend.backend import clear_backends
    clear_backends()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
