"""nnU-Net Generic_UNet in flax, with the reference's anisotropic config.

Parity targets:
- Generic_UNet (networks/nnunet.py:186-478): per-stage conv/pool kernel
  sizes (anisotropic [1,2,2]/[2,2,2]), basic block = conv -> Dropout(p) ->
  InstanceNorm(affine) -> LeakyReLU(1e-2) (ConvDropoutNormNonlin,
  nnunet.py:42-96), BOTH downsampling variants (maxpool, or strided first
  conv when convolutional_pooling), BOTH upsampling variants (interpolation
  Upsample, or transposed conv when convolutional_upsampling), optional
  dropout_in_localization, deep supervision with optional upscale_logits
  (aux heads resized to full resolution, nnunet.py:389-399), feature cap
  320 (2D: 480).
- initialize_network (networks/nnunet.py:500-530): base 16 features, 2
  convs per stage, 6 pool stages with the default_dict kernels
  (nnunet.py:480-498), and — as actually configured there —
  convolutional_pooling=True, convolutional_upsampling=True,
  deep_supervision=False, dropout p=0.

The tiled gaussian/mirror predictor (neural_network.py:96-476) lives in
arco_tpu.eval.tiled_predictor.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# The reference's default_dict kernels (nnunet.py:489-490) are in torch's
# [B, C, D, H, W] axis order: pools [1,2,2]x2, [2,2,2]x2, [1,2,2]x2 — the
# anisotropic '1' protects the thin DEPTH axis. This framework's 3D layout
# is depth-LAST ([B, H, W, D, C], like the LA patch (112,112,80)), so the
# kernels are transposed (d,h,w) -> (h,w,d) to keep the anisotropy on the
# anatomical depth axis. Cumulative lattice per axis: H /64, W /64, D /4
# (bare forwards need lattice-divisible inputs, exactly as the torch
# reference does; the tiled predictor pads).
DEFAULT_POOL_KERNELS = ((2, 2, 1), (2, 2, 1), (2, 2, 2), (2, 2, 2),
                        (2, 2, 1), (2, 2, 1))
DEFAULT_CONV_KERNELS = ((3, 3, 1), (3, 3, 1), (3, 3, 3), (3, 3, 3),
                        (3, 3, 3), (3, 3, 3), (3, 3, 3))
MAX_FEATURES_3D = 320
MAX_FEATURES_2D = 480


class InstanceNormAffine(nn.Module):
    """InstanceNorm with learned scale/bias (norm_op_kwargs affine=True,
    nnunet.py:517)."""
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        axes = tuple(range(1, x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.var(xf, axis=axes, keepdims=True)
        y = (xf - mean) / jnp.sqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return (y * scale + bias).astype(x.dtype)


class ConvNormLRelu(nn.Module):
    """ConvDropoutNormNonlin (nnunet.py:42-96): conv -> dropout -> IN ->
    LeakyReLU."""
    features: int
    kernel: Tuple[int, ...]
    stride: Tuple[int, ...] = None
    dropout_p: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        stride = self.stride or (1,) * len(self.kernel)
        # torch pads (k-1)//2 both sides (conv_pad_sizes, nnunet.py:278-283);
        # flax SAME would pad (0,1) for strided convs on even inputs,
        # shifting every window by one
        pad = tuple((k // 2, k // 2) for k in self.kernel)
        x = nn.Conv(self.features, tuple(self.kernel), strides=tuple(stride),
                    padding=pad, dtype=self.dtype)(x)
        if self.dropout_p > 0:
            x = nn.Dropout(self.dropout_p, deterministic=not train)(x)
        x = InstanceNormAffine()(x)
        return nn.leaky_relu(x, negative_slope=1e-2)


class StackedConvLayers(nn.Module):
    """num_convs stacked blocks; the first may stride (nnunet.py:98-160)."""
    features: int
    num_convs: int
    kernel: Tuple[int, ...]
    first_stride: Tuple[int, ...] = None
    dropout_p: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = ConvNormLRelu(self.features, self.kernel, self.first_stride,
                          self.dropout_p, self.dtype)(x, train)
        for _ in range(self.num_convs - 1):
            x = ConvNormLRelu(self.features, self.kernel, None,
                              self.dropout_p, self.dtype)(x, train)
        return x


def _upsample_interp(x, scale: Tuple[int, ...]):
    """nn.Upsample(scale_factor, mode=bilinear/trilinear) equivalent —
    half-pixel linear resize over the spatial dims."""
    shape = (x.shape[0],) + tuple(s * f for s, f in
                                  zip(x.shape[1:-1], scale)) + (x.shape[-1],)
    return jax.image.resize(x, shape, method="linear").astype(x.dtype)


class GenericUNet(nn.Module):
    """nnU-Net trunk. Returns (logits, bottleneck, feature_maps) in the
    ARCO contract. With deep_supervision=True, ``logits`` is the reference's
    tuple (final head first, then the aux heads coarse->fine reversed, each
    upsampled to full resolution when upscale_logits)."""
    input_channels: int = 1
    base_num_features: int = 16
    num_classes: int = 3
    pool_kernels: Sequence[Tuple[int, ...]] = DEFAULT_POOL_KERNELS
    conv_kernels: Sequence[Tuple[int, ...]] = DEFAULT_CONV_KERNELS
    conv_per_stage: int = 2
    max_features: int = MAX_FEATURES_3D
    deep_supervision: bool = False
    dropout_p: float = 0.0
    dropout_in_localization: bool = False
    upscale_logits: bool = False
    convolutional_pooling: bool = True
    convolutional_upsampling: bool = True
    seg_output_use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        num_pool = len(self.pool_kernels)
        features = [min(self.base_num_features * 2 ** i, self.max_features)
                    for i in range(num_pool + 1)]
        loc_p = self.dropout_p if self.dropout_in_localization else 0.0

        # ---- context pathway (nnunet.py:292-341) -------------------------
        skips = []
        h = x
        for d in range(num_pool):
            first_stride = (tuple(self.pool_kernels[d - 1])
                            if d != 0 and self.convolutional_pooling
                            else None)
            h = StackedConvLayers(features[d], self.conv_per_stage,
                                  self.conv_kernels[d], first_stride,
                                  self.dropout_p, self.dtype)(h, train)
            skips.append(h)
            if not self.convolutional_pooling:
                h = nn.max_pool(h, tuple(self.pool_kernels[d]),
                                strides=tuple(self.pool_kernels[d]))
        # bottleneck: (n-1) convs at doubled features + 1 conv whose width
        # depends on the upsampling variant (nnunet.py:326-341)
        bneck_stride = (tuple(self.pool_kernels[-1])
                        if self.convolutional_pooling else None)
        final_features = (features[num_pool] if self.convolutional_upsampling
                          else features[num_pool - 1])
        h = StackedConvLayers(features[num_pool], self.conv_per_stage - 1,
                              self.conv_kernels[num_pool], bneck_stride,
                              self.dropout_p, self.dtype)(h, train)
        h = StackedConvLayers(final_features, 1, self.conv_kernels[num_pool],
                              None, self.dropout_p, self.dtype)(h, train)
        bottleneck = h

        # ---- localization pathway (nnunet.py:348-383) --------------------
        seg_outputs = []
        feature_maps = [h]
        for u in range(num_pool):
            d = num_pool - 1 - u
            n_skip = features[d]
            pool = tuple(self.pool_kernels[d])
            if self.convolutional_upsampling:
                h = nn.ConvTranspose(n_skip, pool, strides=pool,
                                     padding="VALID", use_bias=False,
                                     dtype=self.dtype)(h)
                final_features = n_skip
            else:
                h = _upsample_interp(h, pool)
                # last conv reduces to the NEXT level's width so the
                # interp-upsampled features match the next skip
                final_features = features[d - 1] if u != num_pool - 1 \
                    else n_skip
            h = jnp.concatenate([h, skips[d]], axis=-1)
            # torch indexes conv_kernel_sizes[-(u+1)] = [d+1]
            # (nnunet.py:370-371) — one coarser than the skip's own stage
            kern = self.conv_kernels[d + 1]
            h = StackedConvLayers(n_skip, self.conv_per_stage - 1,
                                  kern, None, loc_p, self.dtype)(h, train)
            h = StackedConvLayers(final_features, 1, kern,
                                  None, loc_p, self.dtype)(h, train)
            feature_maps.append(h)
            if self.deep_supervision or u == num_pool - 1:
                seg = nn.Conv(self.num_classes, (1,) * (x.ndim - 2),
                              use_bias=self.seg_output_use_bias,
                              dtype=self.dtype)(h)
                seg_outputs.append(seg)

        if self.deep_supervision:
            # (nnunet.py:430-433): final head + reversed aux heads,
            # upsampled to full resolution when upscale_logits
            aux = seg_outputs[:-1][::-1]
            if self.upscale_logits:
                full = x.shape[1:-1]
                aux = [jax.image.resize(
                    s, (s.shape[0],) + tuple(full) + (s.shape[-1],),
                    method="linear").astype(s.dtype) for s in aux]
            logits = tuple([seg_outputs[-1]] + aux)
        else:
            logits = seg_outputs[-1]
        return logits, bottleneck, feature_maps


def initialize_network(num_classes: int = 2, threeD: bool = True,
                       dtype=jnp.float32) -> GenericUNet:
    """Factory matching networks/nnunet.py:500-530: base 16 features, the
    default_dict kernels, convolutional pooling+upsampling, no deep
    supervision, dropout p=0."""
    if threeD:
        return GenericUNet(num_classes=num_classes, dtype=dtype)
    return GenericUNet(
        num_classes=num_classes, max_features=MAX_FEATURES_2D,
        pool_kernels=tuple((2, 2) for _ in range(5)),
        conv_kernels=tuple((3, 3) for _ in range(6)), dtype=dtype)
