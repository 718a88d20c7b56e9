"""Shared flax building blocks (channels-last, bf16-friendly).

Conventions:
- All modules take ``train: bool`` where they hold BatchNorm/Dropout.
- ``dtype`` is the compute dtype (bfloat16 on TPU); parameters stay float32
  so EMA/optimizer math keeps full precision.
- LeakyReLU uses torch's default negative_slope=0.01
  (unetWithArgs.py:42 ``nn.LeakyReLU()``).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


def leaky_relu(x):
    return nn.leaky_relu(x, negative_slope=0.01)


class ConvBNAct(nn.Module):
    """Conv(3^d, same) -> BatchNorm -> activation."""
    features: int
    kernel: int = 3
    act: str = "leaky_relu"
    dtype: jnp.dtype = jnp.float32
    use_norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        nd = x.ndim - 2
        x = nn.Conv(self.features, (self.kernel,) * nd, padding="SAME",
                    dtype=self.dtype)(x)
        if self.use_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
        if self.act == "leaky_relu":
            x = leaky_relu(x)
        elif self.act == "relu":
            x = nn.relu(x)
        elif self.act != "none":
            raise ValueError(self.act)
        return x


class ConvBlock2D(nn.Module):
    """Two (Conv3x3 + BN + LeakyReLU) with Dropout after the first activation
    (unetWithArgs.py:31-47)."""
    features: int
    dropout_p: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = ConvBNAct(self.features, dtype=self.dtype)(x, train)
        x = nn.Dropout(rate=self.dropout_p, deterministic=not train)(x)
        x = ConvBNAct(self.features, dtype=self.dtype)(x, train)
        return x


def max_pool(x, window: int = 2):
    nd = x.ndim - 2
    return nn.max_pool(x, (window,) * nd, strides=(window,) * nd)


class BilinearUp(nn.Module):
    """1x1 conv + 2x bilinear upsample (align_corners=True).

    This is the path the reference UNet ACTUALLY takes: Decoder builds
    UpBlock without passing bilinear (unetWithArgs.py:130-138), so the
    UpBlock default bilinear=True applies (conv1x1 + nn.Upsample,
    unetWithArgs.py:71-76) even though the UNet params dict says
    'bilinear': False (:317) — that flag is stored but never used."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from arco_tpu.ops.interpolate import resize_bilinear
        nd = x.ndim - 2
        x = nn.Conv(self.features, (1,) * nd, dtype=self.dtype)(x)
        return resize_bilinear(x, tuple(2 * s for s in x.shape[1:-1]),
                               align_corners=True)


class ConvTransposeUp(nn.Module):
    """ConvTranspose(kernel=2, stride=2) upsampling (unetWithArgs.py:77-79).

    torch's ConvTranspose2d(k=2, s=2) on an even grid equals flax
    nn.ConvTranspose with kernel 2, stride 2, VALID padding.
    """
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        nd = x.ndim - 2
        return nn.ConvTranspose(self.features, (2,) * nd, strides=(2,) * nd,
                                padding="VALID", dtype=self.dtype)(x)


class MLP2(nn.Module):
    """Two stacked Dense layers (latent predictor, model_2D.py:146-151)."""
    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.Dense(self.out, dtype=self.dtype)(x)
        return x


def adaptive_avg_pool(x: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """torch AdaptiveAvgPool parity for channels-last [..., *spatial, C].

    Pools every spatial axis to ``out_size``. Exact for divisible sizes
    (the only case the reference hits: 64->16, 64->8); general sizes use the
    torch region rule floor(i*n/o) .. ceil((i+1)*n/o).
    """
    spatial = x.shape[1:-1]
    for axis, n in enumerate(spatial, start=1):
        o = out_size
        if n == o:
            continue
        if n % o == 0:
            r = n // o
            shape = list(x.shape)
            new_shape = shape[:axis] + [o, r] + shape[axis + 1:]
            x = x.reshape(new_shape).mean(axis=axis + 1)
        else:
            import numpy as np
            starts = [int(np.floor(i * n / o)) for i in range(o)]
            ends = [int(np.ceil((i + 1) * n / o)) for i in range(o)]
            segs = [jnp.take(x, jnp.arange(s, e), axis=axis).mean(axis=axis,
                                                                  keepdims=True)
                    for s, e in zip(starts, ends)]
            x = jnp.concatenate(segs, axis=axis)
    return x


class FeaturePerturbation:
    """Feature perturbations used by UNet_CCT aux decoders
    (unetWithArgs.py:277-307): Dropout, FeatureDropout, FeatureNoise."""

    @staticmethod
    def dropout(rng, x, p: float = 0.3):
        import jax
        keep = jax.random.bernoulli(rng, 1.0 - p, x.shape)
        return jnp.where(keep, x / (1.0 - p), 0.0).astype(x.dtype)

    @staticmethod
    def feature_dropout(rng, x, low: float = 0.7, high: float = 0.9):
        import jax
        attention = jnp.mean(x, axis=-1, keepdims=True)
        max_val = jnp.max(attention.reshape(x.shape[0], -1), axis=1)
        thresh = max_val * jax.random.uniform(rng, (x.shape[0],), minval=low,
                                              maxval=high)
        thresh = thresh.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(attention < thresh, x, 0.0).astype(x.dtype)

    @staticmethod
    def feature_noise(rng, x, uniform_range: float = 0.3):
        import jax
        noise = jax.random.uniform(rng, x.shape, minval=-uniform_range,
                                   maxval=uniform_range)
        return (x * noise + x).astype(x.dtype)
