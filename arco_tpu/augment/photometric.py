"""Photometric augmentations on device (color jitter, gaussian blur).

Replaces the reference's per-sample PIL round trip (augment.py:133-281,
batch_transform) with vmapped array ops. Equivalence is distributional:
same parameter ranges and application probabilities, no 8-bit quantization.

Reference pipeline per sample (augment.py:168-180):
- 50%: ColorJitter(brightness=(0.75,1.25), contrast=(0.75,1.25),
       saturation=(0.75,1.25), hue=(-0.25,0.25)) — on 1-channel medical
       slices saturation/hue are identity; factors are applied in random
       order in torchvision, here in a fixed order (distribution of the
       composite is near-identical for these ranges).
- 50%: GaussianBlur(sigma ~ U[0.15, 1.15]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from arco_tpu.ops.gaussian import gaussian_blur_runtime_sigma


def _rgb_to_gray(x):
    return (0.299 * x[..., 0:1] + 0.587 * x[..., 1:2] + 0.114 * x[..., 2:3])


def color_jitter(rng, img, brightness=(0.75, 1.25), contrast=(0.75, 1.25),
                 saturation=(0.75, 1.25), hue=(-0.25, 0.25)):
    """One image [..., H, W, C]; C==1 (medical) or 3."""
    kb, kc, ks, kh = jax.random.split(rng, 4)
    x = img.astype(jnp.float32)

    b = jax.random.uniform(kb, (), minval=brightness[0], maxval=brightness[1])
    x = x * b

    c = jax.random.uniform(kc, (), minval=contrast[0], maxval=contrast[1])
    gray_mean = jnp.mean(_rgb_to_gray(x) if x.shape[-1] == 3 else x)
    x = gray_mean + (x - gray_mean) * c

    if x.shape[-1] == 3:
        s = jax.random.uniform(ks, (), minval=saturation[0],
                               maxval=saturation[1])
        g = _rgb_to_gray(x)
        x = g + (x - g) * s
        # cheap hue rotation in YIQ space
        h = jax.random.uniform(kh, (), minval=hue[0], maxval=hue[1]) * jnp.pi * 2
        cos_h, sin_h = jnp.cos(h), jnp.sin(h)
        t_yiq = jnp.array([[0.299, 0.587, 0.114],
                           [0.596, -0.274, -0.322],
                           [0.211, -0.523, 0.312]], jnp.float32)
        t_rgb = jnp.linalg.inv(t_yiq)
        rot = jnp.array([[1, 0, 0],
                         [0, cos_h, -sin_h],
                         [0, sin_h, cos_h]], jnp.float32)
        x = jnp.einsum("...c,dc->...d", jnp.einsum(
            "...c,dc->...d", jnp.einsum("...c,dc->...d", x, t_yiq), rot), t_rgb)

    return jnp.clip(x, 0.0, 1.0).astype(img.dtype)


def random_gaussian_blur(rng, img, sigma_range=(0.15, 1.15)):
    k_s, _ = jax.random.split(rng)
    sigma = jax.random.uniform(k_s, (), minval=sigma_range[0],
                               maxval=sigma_range[1])
    return gaussian_blur_runtime_sigma(img[None], sigma)[0].astype(img.dtype)


def batch_photometric(rng, images, p_jitter: float = 0.5,
                      p_blur: float = 0.5):
    """Per-sample random jitter + blur over a batch [B, H, W, C]
    (augment.py:168-180 applied inside batch_transform's sample loop)."""
    b = images.shape[0]
    keys = jax.random.split(rng, b)

    def per_sample(key, img):
        k_pj, k_j, k_pb, k_b = jax.random.split(key, 4)
        jittered = color_jitter(k_j, img)
        img = jnp.where(jax.random.uniform(k_pj) > 0.5, jittered, img)
        blurred = random_gaussian_blur(k_b, img)
        img = jnp.where(jax.random.uniform(k_pb) > 0.5, blurred, img)
        return img

    return jax.vmap(per_sample)(keys, images)
