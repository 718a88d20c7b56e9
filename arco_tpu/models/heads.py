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


class _Kernel(nn.Module):
    """Bare 1x1-conv kernel with nn.Conv's exact param layout/init, so the
    parameter tree stays {fea_i: {kernel: [1..1, in, out]}} (checkpoint-
    compatible) while the compute graph is free to use the weights
    algebraically."""
    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape)


class FeatureExtractor(nn.Module):
    """Pyramid fuser, algebraically restructured for TPU memory.

    The reference cascade (model_2D.py:20-56) is
        x0 = (W0+I) m0
        x_i = (W_i+I) [up(x_{i-1}); m_i]   (i = 1..3)
        y   = W4 [up(x_3); m_4]
    — every op is channel-linear (1x1 convs, residual adds, bi/trilinear
    resizes), and channel mixing commutes with per-channel spatial
    interpolation. Composing the kernel matrices at trace time therefore
    gives the EXACT same function as
        y = up4(up3(up2(up1(m0 B0) + m1 B1) + m2 B2) + m3 B3) + m4 B4
    with small [c_i, out] matrices B_i — but the intermediates carry only
    ``output_dim`` channels instead of the growing 192..256-channel
    concats. At the 3D ARCO shapes ([4,112,112,80] fused batch) the naive
    cascade materializes five ~1.9 GB full-volume temps (the round-2 HBM
    OOM); this form carries 16-channel tensors (~120 MB) through the same
    resize sequence. Same parameter tree as the cascade (fea0..fea4
    nn.Conv kernels)."""
    fea_dim: Sequence[int] = (256, 128, 64, 32, 16)
    output_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, fea_list):
        # level count generalized (r4): the medical zoo feeds 5 decoder
        # maps, the natural DeepLab branch feeds its 4 ResNet stages —
        # same cascade, n-1 residual fusers + one output projection
        n = len(self.fea_dim)
        assert len(fea_list) == n >= 2
        nd = fea_list[0].ndim - 2
        c = [int(d) for d in self.fea_dim]
        d = [sum(c[:i + 1]) for i in range(n)]  # concat widths d0..d{n-1}

        ones = (1,) * nd
        k = [_Kernel(ones + (c[0], c[0]), name="fea0")()]
        for i in range(1, n - 1):
            k.append(_Kernel(ones + (d[i], d[i]), name=f"fea{i}")())
        k.append(_Kernel(ones + (d[n - 1], self.output_dim),
                         name=f"fea{n - 1}")())
        K = [ki.reshape(ki.shape[-2], ki.shape[-1]).astype(jnp.float32)
             for ki in k]
        eye = lambda m: jnp.eye(m, dtype=jnp.float32)

        # back-substitute: B[i] maps level-i input channels -> output_dim
        A = K[n - 1][:d[n - 2]]               # x_{n-2} -> out
        B = [None] * n
        B[n - 1] = K[n - 1][d[n - 2]:]        # m_{n-1} rows of the last fea
        for i in range(n - 2, 0, -1):
            M = (K[i] + eye(d[i])) @ A        # t_i -> out
            A, B[i] = M[:d[i - 1]], M[d[i - 1]:]
        B[0] = (K[0] + eye(c[0])) @ A

        dot = lambda m, w: jnp.einsum(
            "...c,co->...o", m, w.astype(self.dtype))
        z = dot(fea_list[0], B[0])
        for i in range(1, n):
            z = resize_bilinear(z, fea_list[i].shape[1:-1],
                                align_corners=True)
            z = z + dot(fea_list[i], B[i])
        return z


class ProjectionHead(nn.Module):
    proj_dim: int = 4
    output_pooling_size: int = 16
    proj: str = "convmlp"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pre_pooled: bool = False):
        """pre_pooled: the caller already adaptive-pooled x to
        output_pooling_size (e.g. via ops.patches.pooled_patch_grid, which
        computes the pool without materializing patch pixels) — skip the
        internal pool. Parameter tree is identical either way (the pool has
        no params), so checkpoints are interchangeable."""
        nd = x.ndim - 2
        if self.proj == "linear":
            return nn.Conv(self.proj_dim, (1,) * nd, dtype=self.dtype)(x)
        if not pre_pooled:
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
