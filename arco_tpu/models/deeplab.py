"""DeepLab natural-image branch: dilated ResNet-50/101 backbone with the
DeepLab-v2 multi-dilation classifier and a DeepLab-v3 ASPP head.

Parity targets:
- models/deeplab.py:83-260 — ResNet Bottleneck trunk, layers 3/4 dilated
  (stride 1, dilation 2/4), Classifier_Module summing four dilated 3x3
  branches (dilations 6/12/18/24), Res50/101_Deeplab factories
  (models/deeplab.py:255-260).
- models/deeplabv3/aspp.py — ASPP (1x1 + three dilated 3x3 + image pooling,
  project to 256) and DeepLabHead.
- models/model_factory.py:19-61 — string dispatch ('deeplabv2/v3',
  resnet50/101).

The caffe-pretrained weight URLs of the reference are not downloadable here
(zero egress); training starts from random init unless a local checkpoint is
supplied.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from arco_tpu.models.layers import max_pool
from arco_tpu.ops.interpolate import resize_bilinear


class Bottleneck(nn.Module):
    """ResNet bottleneck with optional dilation (deeplab.py:83-128)."""
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn = lambda h: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, dtype=self.dtype)(h)
        residual = x
        h = nn.relu(bn(nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, dtype=self.dtype)(x)))
        h = nn.relu(bn(nn.Conv(self.planes, (3, 3), padding="SAME",
                               kernel_dilation=(self.dilation,) * 2,
                               use_bias=False, dtype=self.dtype)(h)))
        h = bn(nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                       dtype=self.dtype)(h))
        if self.downsample:
            residual = bn(nn.Conv(self.planes * 4, (1, 1),
                                  strides=(self.stride,) * 2, use_bias=False,
                                  dtype=self.dtype)(x))
        return nn.relu(h + residual)


class ResNetBackbone(nn.Module):
    """Dilated ResNet trunk, output stride 8 (deeplab.py:149-209)."""
    layers: Sequence[int] = (3, 4, 6, 3)      # ResNet-50
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn = lambda h: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, dtype=self.dtype)(h)
        h = nn.relu(bn(nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME",
                               use_bias=False, dtype=self.dtype)(x)))
        h = max_pool(h)
        specs = [(64, 1, 1), (128, 2, 1), (256, 1, 2), (512, 1, 4)]
        feats = []
        for (planes, stride, dilation), blocks in zip(specs, self.layers):
            h = Bottleneck(planes, stride, dilation, downsample=True,
                           dtype=self.dtype)(h, train)
            for _ in range(blocks - 1):
                h = Bottleneck(planes, 1, dilation, dtype=self.dtype)(h,
                                                                      train)
            feats.append(h)
        return feats


class ClassifierModule(nn.Module):
    """DeepLab-v2 head: sum of dilated 3x3 conv branches
    (deeplab.py:130-147, dilations 6/12/18/24)."""
    num_classes: int
    dilations: Sequence[int] = (6, 12, 18, 24)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        outs = [nn.Conv(self.num_classes, (3, 3), padding="SAME",
                        kernel_dilation=(d, d), dtype=self.dtype)(x)
                for d in self.dilations]
        return sum(outs)


class ASPP(nn.Module):
    """DeepLab-v3 ASPP (models/deeplabv3/aspp.py)."""
    atrous_rates: Sequence[int] = (12, 24, 36)
    out_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn = lambda h: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, dtype=self.dtype)(h)
        branches = [nn.relu(bn(nn.Conv(self.out_channels, (1, 1),
                                       use_bias=False, dtype=self.dtype)(x)))]
        for r in self.atrous_rates:
            branches.append(nn.relu(bn(nn.Conv(
                self.out_channels, (3, 3), padding="SAME",
                kernel_dilation=(r, r), use_bias=False,
                dtype=self.dtype)(x))))
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = nn.relu(bn(nn.Conv(self.out_channels, (1, 1),
                                    use_bias=False, dtype=self.dtype)(pooled)))
        pooled = jnp.broadcast_to(pooled, x.shape[:-1]
                                  + (self.out_channels,))
        branches.append(pooled)
        h = jnp.concatenate(branches, axis=-1)
        h = nn.relu(bn(nn.Conv(self.out_channels, (1, 1), use_bias=False,
                               dtype=self.dtype)(h)))
        return nn.Dropout(0.5, deterministic=not train)(h)


class DeepLab(nn.Module):
    """ResNet + (v2 classifier | v3 ASPP head), logits upsampled to input
    size; also returns the backbone feature as the ARCO-style representation
    (models/deeplab_2branch.py returns (logits, feats))."""
    num_classes: int = 21
    layers: Sequence[int] = (3, 4, 6, 3)
    head: str = "v2"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        feats = ResNetBackbone(self.layers, self.dtype)(x, train)
        h = feats[-1]
        if self.head == "v2":
            logits = ClassifierModule(self.num_classes,
                                      dtype=self.dtype)(h)
        else:
            h2 = ASPP(dtype=self.dtype)(h, train)
            h2 = nn.relu(nn.BatchNorm(use_running_average=not train,
                                      momentum=0.9, dtype=self.dtype)(
                nn.Conv(256, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype)(h2)))
            logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype)(h2)
        logits = resize_bilinear(logits, x.shape[1:-1], align_corners=False)
        return logits, feats[-1], feats


def model_generator(model: str = "deeplabv2", backbone: str = "resnet101",
                    num_classes: int = 21, dtype=jnp.float32) -> DeepLab:
    """models/model_factory.py:19-61 dispatch."""
    layers = (3, 4, 23, 3) if "101" in backbone else (3, 4, 6, 3)
    head = "v3" if "v3" in model else "v2"
    return DeepLab(num_classes=num_classes, layers=layers, head=head,
                   dtype=dtype)


def Res50_Deeplab(num_classes: int = 21, dtype=jnp.float32) -> DeepLab:
    return DeepLab(num_classes=num_classes, layers=(3, 4, 6, 3), dtype=dtype)


def Res101_Deeplab(num_classes: int = 21, dtype=jnp.float32) -> DeepLab:
    return DeepLab(num_classes=num_classes, layers=(3, 4, 23, 3), dtype=dtype)
