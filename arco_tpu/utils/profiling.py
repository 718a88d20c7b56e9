"""Profiling helpers.

The reference's only profiling code is measure_fp_bp_time /
benchmark_fp_bp_time (networks/networks_other.py:203-258, torch.cuda.Event
timing). Equivalents here time jitted forward / forward+backward with
block_until_ready, plus a context manager around jax.profiler traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


def measure_fp_time(apply_fn: Callable, x, n: int = 10, warmup: int = 2):
    """Mean seconds per forward (networks_other.py:203-224 analog)."""
    fn = jax.jit(apply_fn)
    for _ in range(warmup):
        out = fn(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def measure_fp_bp_time(loss_fn: Callable, params, x, n: int = 10,
                       warmup: int = 2):
    """Mean seconds per forward+backward (networks_other.py:226-258
    analog). loss_fn(params, x) -> scalar."""
    grad_fn = jax.jit(jax.grad(loss_fn))
    for _ in range(warmup):
        g = grad_fn(params, x)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(n):
        g = grad_fn(params, x)
    jax.block_until_ready(g)
    return (time.perf_counter() - t0) / n


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace context; view with TensorBoard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def step_timer(step_fn: Callable, state, batch, n: int = 10,
               warmup: int = 2):
    """Steady-state seconds/step for a (state, batch) -> (state, metrics)
    jitted train step."""
    for _ in range(warmup):
        state, metrics = step_fn(state, batch)
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = step_fn(state, batch)
    jax.block_until_ready(metrics)
    return (time.perf_counter() - t0) / n, state
