"""Gaussian smoothing as separable depthwise convolutions.

Parity targets:
- AdvMorph velocity-field smoothing (adv_morph.py:457-499): 2D gaussian,
  kernel fixed by sigma with the reference's size rule
  ``max(ks, 2*int(3.5*sigma)+1)``, 'same' zero padding.
- Photometric gaussian blur (augment.py:178-180): PIL GaussianBlur with a
  *runtime* sigma — implemented by evaluating the kernel from a traced sigma
  over a static radius.

Channels-last; the 2D blur is two rank-1 convolutions (VPU-friendly, no MXU
needed for 1-channel fields).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def gaussian_kernel_1d(sigma: float, kernel_size: int) -> jnp.ndarray:
    """Static-sigma normalized 1D kernel."""
    x = jnp.arange(kernel_size, dtype=jnp.float32) - (kernel_size - 1) / 2.0
    k = jnp.exp(-(x * x) / (2.0 * sigma ** 2))
    return k / jnp.sum(k)


def adv_morph_kernel_size(kernel_size: int, sigma: float) -> int:
    """Reference size rule (adv_morph.py:460-462)."""
    if kernel_size < 2 * int(3.5 * sigma) + 1:
        return 2 * int(3.5 * sigma) + 1
    return kernel_size


def _conv_axis(x: jnp.ndarray, kernel: jnp.ndarray, axis: int) -> jnp.ndarray:
    """'same' zero-padded 1D convolution along ``axis`` of a channels-last
    array, applied identically to every channel."""
    ks = kernel.shape[0]
    pad = ks // 2
    moved = jnp.moveaxis(x, axis, -1)
    lead = moved.shape[:-1]
    flat = moved.reshape(-1, 1, moved.shape[-1])
    out = jax.lax.conv_general_dilated(
        flat.astype(jnp.float32),
        kernel.reshape(1, 1, ks).astype(jnp.float32),
        window_strides=(1,), padding=[(pad, pad)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST)
    out = out.reshape(*lead, out.shape[-1])
    return jnp.moveaxis(out, -1, axis).astype(x.dtype)


def gaussian_blur_2d(x: jnp.ndarray, sigma: float, kernel_size: int,
                     separable: bool = True) -> jnp.ndarray:
    """Blur [..., H, W, C] over H and W with a static sigma.

    Note: the reference builds a full 2D kernel as a product of two 1D
    gaussians then renormalizes (adv_morph.py:479-492); a separable pair of
    normalized 1D convolutions is mathematically identical.
    """
    k = gaussian_kernel_1d(sigma, kernel_size)
    x = _conv_axis(x, k, axis=-3)
    x = _conv_axis(x, k, axis=-2)
    return x


def gaussian_blur_runtime_sigma(x: jnp.ndarray, sigma, radius: int = 4):
    """Blur [..., H, W, C] with a traced per-call sigma (PIL GaussianBlur
    analog for augment.py:178-180, sigma ~ U[0.15, 1.15] => radius 4 covers
    3.5*sigma_max).

    PIL uses an approximated box-blur cascade; a true gaussian is used here —
    equivalence is distributional, not bitwise.
    """
    pos = jnp.arange(2 * radius + 1, dtype=jnp.float32) - radius
    k = jnp.exp(-(pos * pos) / (2.0 * sigma ** 2))
    k = k / jnp.sum(k)
    x = _conv_axis(x, k, axis=-3)
    x = _conv_axis(x, k, axis=-2)
    return x
