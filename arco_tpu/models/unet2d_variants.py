"""Auxiliary 2D U-Net variants: STEGO distillation head and HAR
(holistic-attention regularization) pre-affine BatchNorm taps.

Parity targets:
- unetWithArgsSTEGO.py:140-166,316-360: same UNet trunk; the decoder adds a
  nonlinear cluster projection (1x1 -> ReLU -> 1x1) whose output is summed
  into the segmentation logits.
- unetWithArgs_HAR.py:31-120,352-474 (+ net_factory_args_HAR.py:76): every
  ConvBlock's BatchNorm also exposes its pre-affine normalized output;
  forward returns (logits, latent, feature_maps, bn_outputs) so the HAR
  regularizer can penalize the pre-affine statistics.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from arco_tpu.models.layers import BilinearUp, leaky_relu, max_pool
from arco_tpu.models.unet2d import Encoder


class BatchNormMul(nn.Module):
    """BatchNorm returning (affine_out, pre_affine_out)
    (unetWithArgs_HAR.py:31-44)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn_out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5, use_bias=False, use_scale=False,
                              dtype=self.dtype)(x)
        gamma = self.param("gamma", nn.initializers.ones, (x.shape[-1],))
        beta = self.param("beta", nn.initializers.zeros, (x.shape[-1],))
        return bn_out * gamma + beta, bn_out


class ConvBlockHAR(nn.Module):
    features: int
    dropout_p: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn_outputs = []
        x = nn.Conv(self.features, (3, 3), padding="SAME",
                    dtype=self.dtype)(x)
        x, bn = BatchNormMul(self.dtype)(x, train)
        bn_outputs.append(bn)
        x = leaky_relu(x)
        x = nn.Dropout(self.dropout_p, deterministic=not train)(x)
        x = nn.Conv(self.features, (3, 3), padding="SAME",
                    dtype=self.dtype)(x)
        x, bn = BatchNormMul(self.dtype)(x, train)
        bn_outputs.append(bn)
        return leaky_relu(x), bn_outputs


class UNetHAR(nn.Module):
    """unetWithArgs_HAR.py:352 — UNet trunk threading pre-affine BN taps."""
    in_chns: int = 1
    class_num: int = 4
    ft_chns: Sequence[int] = (16, 32, 64, 128, 256)
    dropout: Sequence[float] = (0.05, 0.1, 0.2, 0.3, 0.5)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn_outputs = []
        feats = []
        h, bns = ConvBlockHAR(self.ft_chns[0], self.dropout[0],
                              self.dtype)(x, train)
        bn_outputs += bns
        feats.append(h)
        for ch, p in zip(self.ft_chns[1:], self.dropout[1:]):
            h = max_pool(h)
            h, bns = ConvBlockHAR(ch, p, self.dtype)(h, train)
            bn_outputs += bns
            feats.append(h)

        feature_map = [feats[-1]]
        h = feats[-1]
        for skip, ch in zip(feats[-2::-1], self.ft_chns[-2::-1]):
            h = BilinearUp(ch, self.dtype)(h)
            h = jnp.concatenate([skip, h], axis=-1)
            h, bns = ConvBlockHAR(ch, 0.0, self.dtype)(h, train)
            bn_outputs += bns
            feature_map.append(h)
        logits = nn.Conv(self.class_num, (3, 3), padding="SAME",
                         dtype=self.dtype)(h)
        return logits, feats[-1], feature_map, bn_outputs


class UNetSTEGO(nn.Module):
    """unetWithArgsSTEGO.py:316 — UNet whose head adds a nonlinear cluster
    projection into the logits (:140-166)."""
    in_chns: int = 1
    class_num: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        from arco_tpu.models.unet2d import ConvBlock2D
        feats = Encoder(dtype=self.dtype)(x, train)
        ft = (16, 32, 64, 128, 256)
        feature_map = [feats[-1]]
        h = feats[-1]
        for skip, ch in zip(feats[-2::-1], ft[-2::-1]):
            h = BilinearUp(ch, self.dtype)(h)
            h = jnp.concatenate([skip, h], axis=-1)
            h = ConvBlock2D(ch, 0.0, self.dtype)(h, train)
            feature_map.append(h)
        logits = nn.Conv(self.class_num, (3, 3), padding="SAME",
                         dtype=self.dtype)(h)
        cluster = nn.Conv(ft[0], (1, 1), dtype=self.dtype)(h)
        cluster = nn.relu(cluster)
        cluster = nn.Conv(self.class_num, (1, 1), dtype=self.dtype)(cluster)
        logits = logits + cluster
        return logits, feats[-1], feature_map
