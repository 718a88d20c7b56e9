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
# from the TPU cache. The dir is KEYED BY A CPU FINGERPRINT: the sandbox
# can move between physical hosts across sessions, and XLA:CPU AOT
# entries compiled on a different machine load with feature mismatches
# (cpu_aot_loader warns of possible SIGILL; different codegen also
# changes f32 reduction orders). A host change simply starts a fresh
# cache. Disable with ARCO_NO_COMPILE_CACHE=1 (e.g. when timing cold
# compiles).
if not os.environ.get("ARCO_NO_COMPILE_CACHE"):  # pragma: no branch
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as _f:
            _flags_lines = sorted({l.strip() for l in _f
                                   if l.startswith(("flags", "Features"))})
        _fp_src = platform.machine() + "|" + "|".join(_flags_lines)
    except OSError:  # non-Linux fallback
        _fp_src = platform.machine() + "|" + platform.processor()
    _fp = hashlib.sha256(_fp_src.encode()).hexdigest()[:12]
    _cache = os.path.join(os.path.expanduser("~"), ".cache",
                          f"arco_tpu_xla_cpu_tests_{_fp}")
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
