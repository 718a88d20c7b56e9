"""Persistent XLA compilation cache.

The full ARCO train step is one large XLA program (six U-Net forwards +
contrastive memobank loss); its first compile on the tunneled TPU backend
takes ~10 minutes. Enabling JAX's persistent compilation cache makes every
subsequent process (bench runs, trainer restarts, bisect variants) load the
executable from disk in seconds instead.

Call ``enable_persistent_cache()`` before the first jitted call. Entry
points (bench.py, CLI trainers, scripts/) do this by default; set
ARCO_NO_COMPILE_CACHE=1 to disable (e.g. when timing cold compiles).
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.environ.get(
    "ARCO_COMPILE_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "arco_tpu_xla"))


def enable_persistent_cache(path: str = None) -> str | None:
    """Idempotently enable the JAX persistent compilation cache.

    Skipped when the process is pinned to CPU (JAX_PLATFORMS=cpu): CPU
    programs compile in seconds, and reloading CPU AOT entries produced by
    the remote compile helper on a different host trips machine-feature
    mismatches (cpu_aot_loader warnings, potential SIGILL). The cache
    exists for the tunneled TPU backend's ~10-minute compiles."""
    if os.environ.get("ARCO_NO_COMPILE_CACHE"):
        return None
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return None
    import jax

    if jax.config.jax_platforms and \
            str(jax.config.jax_platforms).strip().lower() == "cpu":
        return None
    # If a backend is ALREADY initialized, trust it over the env (covers
    # implicit CPU fallback when no accelerator plugin is present). The
    # check never initializes a backend itself — that could block for
    # minutes when the TPU tunnel is down.
    try:
        from jax._src import xla_bridge as _xb
        if _xb.backends_are_initialized() and \
                jax.default_backend() == "cpu":
            return None
    except Exception:
        pass

    path = path or DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that takes longer than a second to build
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax without the knobs: best-effort
        try:
            from jax.experimental.compilation_cache import compilation_cache
            compilation_cache.set_cache_dir(path)
        except Exception:
            return None
    return path
