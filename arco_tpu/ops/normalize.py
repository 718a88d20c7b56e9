"""Shared L2 normalization (one definition; three call-site families).

Norms accumulate in f32; the output keeps the input dtype so bf16 banks and
reps stay bf16 into MXU matmuls (which accumulate f32 via
preferred_element_type)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, axis=-1, eps: float = 1e-24) -> jnp.ndarray:
    """x / ||x||_2 along ``axis`` (an int or a tuple of axes)."""
    n2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(n2 + eps)).astype(x.dtype)


def feature_axes(x: jnp.ndarray) -> tuple:
    """All axes but the leading batch axis."""
    return tuple(range(1, x.ndim))
