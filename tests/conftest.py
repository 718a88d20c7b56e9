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

# Persistent compile cache for the CPU test backend: the suite is
# compile-bound on this 1-core host (measured 80s -> 21s for a UNet
# init+jit on the second run). A test-only cache dir keeps it separate
# from the TPU cache; same-host reuse is safe (the cpu_aot_loader
# "prefer-no-scatter" feature warnings are tuning hints, not ISA
# mismatches). Disable with ARCO_NO_COMPILE_CACHE=1 (e.g. when timing
# cold compiles).
if not os.environ.get("ARCO_NO_COMPILE_CACHE"):  # pragma: no branch
    _cache = os.path.join(os.path.expanduser("~"), ".cache",
                          "arco_tpu_xla_cpu_tests")
    os.makedirs(_cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
