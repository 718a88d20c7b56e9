"""Segmentation-map discriminators (networks/discriminator.py:6-100).

FC3DDiscriminator / FCDiscriminator: dual-stem (seg map + image) strided-conv
classifiers used by adversarial semi-supervised variants. Channels-last.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


class FC3DDiscriminator(nn.Module):
    num_classes: int
    ndf: int = 64
    n_channel: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, seg_map, image, train: bool = True):
        conv = lambda f: nn.Conv(f, (4, 4, 4), strides=(2, 2, 2),
                                 padding=((1, 1),) * 3, dtype=self.dtype)
        drop = nn.Dropout(0.5, deterministic=not train)
        x = conv(self.ndf)(seg_map) + conv(self.ndf)(image)
        x = drop(_lrelu(x))
        x = drop(_lrelu(conv(self.ndf * 2)(x)))
        x = drop(_lrelu(conv(self.ndf * 4)(x)))
        x = _lrelu(conv(self.ndf * 8)(x))
        x = jnp.mean(x, axis=(1, 2, 3))          # global avg pool
        return nn.Dense(2, dtype=self.dtype)(x)


class FCDiscriminator(nn.Module):
    num_classes: int
    ndf: int = 64
    n_channel: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, seg_map, feature, train: bool = True):
        conv = lambda f: nn.Conv(f, (4, 4), strides=(2, 2),
                                 padding=((1, 1),) * 2, dtype=self.dtype)
        drop = nn.Dropout(0.5, deterministic=not train)
        x = conv(self.ndf)(seg_map) + conv(self.ndf)(feature)
        x = drop(_lrelu(conv(self.ndf * 2)(x)))
        x = drop(_lrelu(conv(self.ndf * 4)(x)))
        x = _lrelu(conv(self.ndf * 8)(x))
        # reference: AvgPool2d(7) then Linear(ndf*32, 2) sized for 224
        # inputs (discriminator.py:72-75); global pooling generalizes that
        x = nn.avg_pool(x, (7, 7), strides=(7, 7)) \
            if x.shape[1] >= 7 and x.shape[1] % 7 == 0 else \
            jnp.mean(x, axis=(1, 2), keepdims=True)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(2, dtype=self.dtype)(x)
