"""3D V-Net — ARCO's main 3D backbone, rebuilt in flax (channels-last NDHWC).

Parity target: networks/vnetWithArgs.py:145-282 —
n_filters=16, 5 encoder stages with conv-stride-2 downsampling, residual-add
skip connections in the decoder, ConvTranspose(k=2,s=2) upsampling,
batchnorm (factory default, net_factory_3dArgs.py:16-17), dropout p=0.5 at
the bottleneck and before the head when has_dropout.

Forward contract (vnetWithArgs.py:244-252):
    logits, feature_map[0], feature_map
with feature_map channels [128, 64, 32, 16, 16] coarse->fine for n_filters=16.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from arco_tpu.models.layers import ConvBNAct, ConvTransposeUp


class VNetConvBlock(nn.Module):
    """n_stages x (Conv3 + BN + ReLU) (vnetWithArgs.py:5-31)."""
    n_stages: int
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        for _ in range(self.n_stages):
            x = ConvBNAct(self.features, act="relu", dtype=self.dtype)(x, train)
        return x


class DownBlock(nn.Module):
    """Conv(stride=2, kernel=2) + BN + ReLU (vnetWithArgs.py:67-92)."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.features, (2, 2, 2), strides=(2, 2, 2),
                    padding="VALID", dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return nn.relu(x)


class UpBlock(nn.Module):
    """ConvTranspose(stride=2) + BN + ReLU (vnetWithArgs.py:95-117)."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = ConvTransposeUp(self.features, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return nn.relu(x)


class VNet(nn.Module):
    n_channels: int = 1
    n_classes: int = 2
    n_filters: int = 16
    has_dropout: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, turnoff_drop: bool = False):
        nf = self.n_filters
        drop = self.has_dropout and not turnoff_drop
        dout = nn.Dropout(rate=0.5, deterministic=not (train and drop))

        # encoder (vnetWithArgs.py:180-201)
        x1 = VNetConvBlock(1, nf, self.dtype)(x, train)
        x = DownBlock(2 * nf, self.dtype)(x1, train)
        x2 = VNetConvBlock(2, 2 * nf, self.dtype)(x, train)
        x = DownBlock(4 * nf, self.dtype)(x2, train)
        x3 = VNetConvBlock(3, 4 * nf, self.dtype)(x, train)
        x = DownBlock(8 * nf, self.dtype)(x3, train)
        x4 = VNetConvBlock(3, 8 * nf, self.dtype)(x, train)
        x = DownBlock(16 * nf, self.dtype)(x4, train)
        x5 = VNetConvBlock(3, 16 * nf, self.dtype)(x, train)
        x5 = dout(x5)

        # decoder (vnetWithArgs.py:203-241): residual-add skips
        feature_map = []
        x = UpBlock(8 * nf, self.dtype)(x5, train) + x4
        feature_map.append(x)
        x = VNetConvBlock(3, 8 * nf, self.dtype)(x, train)
        x = UpBlock(4 * nf, self.dtype)(x, train) + x3
        feature_map.append(x)
        x = VNetConvBlock(3, 4 * nf, self.dtype)(x, train)
        x = UpBlock(2 * nf, self.dtype)(x, train) + x2
        feature_map.append(x)
        x = VNetConvBlock(2, 2 * nf, self.dtype)(x, train)
        x = UpBlock(nf, self.dtype)(x, train) + x1
        feature_map.append(x)
        x9 = VNetConvBlock(1, nf, self.dtype)(x, train)
        feature_map.append(x9)
        x9 = dout(x9)
        logits = nn.Conv(self.n_classes, (1, 1, 1), dtype=self.dtype)(x9)
        return logits, feature_map[0], feature_map
