"""Projection / fusion heads for the ISD and ARCO stages — rank-generic.

The reference duplicates every head for 2D and 3D (model_2D.py:20-113 vs
model_3D.py:20-217); flax convs are rank-agnostic with channels-last, so one
module serves both (the SURVEY §0 naming-trap fix).

- FeatureExtractor: pyramid fuser — per-level 1x1 conv + residual, upsample
  (bi/trilinear, align_corners=True), concat next level; final 1x1 conv to
  output_dim (model_2D.py:20-56, model_3D.py:20-63).
- ProjectionHead: AdaptiveAvgPool(output_pooling_size) + 1x1 convs
  (model_2D.py:67-92).
- RepresentationHead: 3x3 conv (no bias) + 1x1 conv (model_2D.py:87-95).
- MLP: global pool + 2 Dense, used as latent head (model_2D.py:98-112).
- Predictor heads: latent_predictor (2 Dense, model_2D.py:146-151) and
  outputs_predictor (2 1x1 convs, model_2D.py:157-160).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from arco_tpu.models.layers import adaptive_avg_pool
from arco_tpu.ops.interpolate import resize_bilinear


class FeatureExtractor(nn.Module):
    fea_dim: Sequence[int] = (256, 128, 64, 32, 16)
    output_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, fea_list):
        assert len(fea_list) == len(self.fea_dim) == 5
        x = fea_list[0]
        x = nn.Conv(x.shape[-1], (1,) * (x.ndim - 2), use_bias=False,
                    dtype=self.dtype, name="fea0")(x) + x
        for i, nxt in enumerate(fea_list[1:], start=1):
            x = resize_bilinear(x, nxt.shape[1:-1], align_corners=True)
            x = jnp.concatenate([x, nxt], axis=-1)
            if i < 4:
                x = nn.Conv(x.shape[-1], (1,) * (x.ndim - 2), use_bias=False,
                            dtype=self.dtype, name=f"fea{i}")(x) + x
            else:
                x = nn.Conv(self.output_dim, (1,) * (x.ndim - 2),
                            use_bias=False, dtype=self.dtype, name="fea4")(x)
        return x


class ProjectionHead(nn.Module):
    proj_dim: int = 4
    output_pooling_size: int = 16
    proj: str = "convmlp"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        nd = x.ndim - 2
        if self.proj == "linear":
            return nn.Conv(self.proj_dim, (1,) * nd, dtype=self.dtype)(x)
        x = adaptive_avg_pool(x, self.output_pooling_size)
        x = nn.Conv(x.shape[-1] * 2, (1,) * nd, dtype=self.dtype)(x)
        x = nn.Conv(self.proj_dim, (1,) * nd, dtype=self.dtype)(x)
        return x


class RepresentationHead(nn.Module):
    output_channel: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        nd = x.ndim - 2
        x = nn.Conv(self.output_channel, (3,) * nd, padding="SAME",
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.Conv(self.output_channel, (1,) * nd, dtype=self.dtype)(x)
        return x


class QRepresentation(nn.Module):
    """Two bias-free 1x1 convs over the fused 496-ch map
    (train_arco_2d.py:231-235)."""
    channels: int = 256 + 128 + 64 + 32 + 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        nd = x.ndim - 2
        x = nn.Conv(self.channels, (1,) * nd, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.Conv(self.channels, (1,) * nd, use_bias=False,
                    dtype=self.dtype)(x)
        return x


class LatentMLP(nn.Module):
    """Global-pool MLP latent head (model_2D.py:98-112)."""
    input_channels: int = 256
    num_class: int = 128
    pooling_size: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = adaptive_avg_pool(x, self.pooling_size)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.input_channels, dtype=self.dtype)(x)
        x = nn.Dense(self.num_class, dtype=self.dtype)(x)
        return x


class LatentPredictor(nn.Module):
    """Two Dense layers (model_2D.py:146-151)."""
    feature_size: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.feature_size, dtype=self.dtype)(x)
        x = nn.Dense(self.feature_size, dtype=self.dtype)(x)
        return x


class OutputsPredictor(nn.Module):
    """Two 1x1 convs over class maps (model_2D.py:157-160)."""
    num_classes: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        nd = x.ndim - 2
        x = nn.Conv(self.num_classes, (1,) * nd, dtype=self.dtype)(x)
        x = nn.Conv(self.num_classes, (1,) * nd, dtype=self.dtype)(x)
        return x
