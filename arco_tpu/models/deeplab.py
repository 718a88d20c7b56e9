"""DeepLab natural-image branch — the reference's two model families,
re-built channels-last for TPU with import parity to their torch trees.

Parity targets:
- models/deeplab.py:83-260 — caffe-style ResNet (stride on the 1x1 conv1 of
  each Bottleneck, maxpool 3x3/s2/p1 ceil_mode, layers 3/4 dilated 2/4 at
  stride 1, every layer's first block downsampled), Classifier_Module
  summing four dilated 3x3 branches (6/12/18/24), BatchNorms FROZEN
  (requires_grad=False on every BN — replicated here by excluding BN
  params from the optimizer via freeze.deeplab_bn_mask).
  Forward contract (deeplab.py:193-209): returns (None, layer3_feature,
  logits_at_1/8) — the ARCO adapter below maps this to
  (logits, latent=layer3, [layer1..layer4]).
- models/deeplabv3/deeplabv3.py:6-92 (DeepLabv3Plus) — TORCHVISION-style
  ResNet (stride on the 3x3 conv2), dilate_scale=16 (layer4 de-strided and
  dilated 2), ASPP [6,12,18] (aspp.py:42-66, project WITHOUT dropout),
  low-level project 256->48, twin classifier/representation heads on the
  304-ch concat; returns (prediction, representation) at 1/4 resolution.
- models/model_factory.py:19-61 — string dispatch; the caffe-pretrained
  URLs are not downloadable here (zero egress), so pretrained init loads a
  LOCAL torch checkpoint via compat.torch_import.convert_deeplab_state_dict
  (same partial-copy semantics: only name+shape matches are taken).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

from arco_tpu.ops.interpolate import resize_bilinear


def max_pool_ceil(x, window: int = 3, stride: int = 2, pad: int = 1):
    """torch MaxPool2d(kernel, stride, padding, ceil_mode=True) semantics:
    output size ceil((H + 2p - k)/s) + 1, with the constraint that the last
    window must START inside the input-or-left-padding region."""
    nd = x.ndim - 2
    dims = x.shape[1:-1]
    pads = [(0, 0)]
    for h in dims:
        out = -(-(h + 2 * pad - window) // stride) + 1
        if (out - 1) * stride >= h + pad:    # last window starts in right pad
            out -= 1
        hi = (out - 1) * stride + window - h - pad
        pads.append((pad, max(hi, pad)))
    pads.append((0, 0))
    # -inf init: JAX only recognizes the max monoid (and thus the
    # select-and-scatter VJP) at the identity element
    neg = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
           else jnp.iinfo(x.dtype).min)
    return lax.reduce_window(
        x, neg, lax.max, (1,) + (window,) * nd + (1,),
        (1,) + (stride,) * nd + (1,), pads)


class Bottleneck(nn.Module):
    """ResNet bottleneck. caffe=True puts the stride on conv1
    (deeplab.py:88, the caffe-converted DeepLab-v2 trunk); caffe=False on
    the 3x3 conv2 (torchvision, used by DeepLabv3Plus)."""
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    caffe: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn = lambda h: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype)(h)
        s1 = self.stride if self.caffe else 1
        s2 = 1 if self.caffe else self.stride
        residual = x
        h = nn.relu(bn(nn.Conv(self.planes, (1, 1), strides=(s1, s1),
                               use_bias=False, dtype=self.dtype)(x)))
        h = nn.relu(bn(nn.Conv(self.planes, (3, 3), strides=(s2, s2),
                               padding=self.dilation,
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
    """Dilated ResNet trunk, output stride 8 (caffe DeepLab-v2,
    deeplab.py:149-173) or 16 (torchvision flavor at dilate_scale=16,
    deeplabv3.py:9-17). Returns the four stage outputs."""
    layers: Sequence[int] = (3, 4, 6, 3)      # ResNet-50
    caffe: bool = True
    output_stride: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn = lambda h: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype)(h)
        h = nn.relu(bn(nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                               use_bias=False, dtype=self.dtype)(x)))
        h = max_pool_ceil(h) if self.caffe else lax.reduce_window(
            h, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])
        if self.output_stride == 8:
            specs = [(64, 1, 1), (128, 2, 1), (256, 1, 2), (512, 1, 4)]
        else:   # dilate_scale=16: layer3 keeps stride 2, layer4 dilated 2
            specs = [(64, 1, 1), (128, 2, 1), (256, 2, 1), (512, 1, 2)]
        feats = []
        for li, ((planes, stride, dilation), blocks) in enumerate(
                zip(specs, self.layers)):
            # the caffe trunk downsamples the first block of EVERY layer
            # (deeplab.py:175-180: dilation==2/4 also forces downsample);
            # torchvision does too whenever channels change — same result
            h = Bottleneck(planes, stride, dilation, downsample=True,
                           caffe=self.caffe, dtype=self.dtype)(h, train)
            for _ in range(blocks - 1):
                h = Bottleneck(planes, 1, dilation, caffe=self.caffe,
                               dtype=self.dtype)(h, train)
            feats.append(h)
        return feats


class ClassifierModule(nn.Module):
    """DeepLab-v2 head: SUM of dilated 3x3 conv branches
    (deeplab.py:130-146, dilations 6/12/18/24, bias=True)."""
    num_classes: int
    dilations: Sequence[int] = (6, 12, 18, 24)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        outs = [nn.Conv(self.num_classes, (3, 3), padding=d,
                        kernel_dilation=(d, d), dtype=self.dtype)(x)
                for d in self.dilations]
        out = outs[0]
        for o in outs[1:]:
            out = out + o
        return out


class ASPP(nn.Module):
    """DeepLabv3Plus ASPP (models/deeplabv3/aspp.py:42-66): 1x1 + three
    dilated 3x3 + global pooling branch, 5*256 -> 256 project, NO dropout
    (commented out in the reference)."""
    atrous_rates: Sequence[int] = (6, 12, 18)
    out_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn = lambda h: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype)(h)
        branches = [nn.relu(bn(nn.Conv(self.out_channels, (1, 1),
                                       use_bias=False, dtype=self.dtype)(x)))]
        for r in self.atrous_rates:
            branches.append(nn.relu(bn(nn.Conv(
                self.out_channels, (3, 3), padding=r,
                kernel_dilation=(r, r), use_bias=False,
                dtype=self.dtype)(x))))
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = nn.relu(bn(nn.Conv(self.out_channels, (1, 1),
                                    use_bias=False, dtype=self.dtype)(pooled)))
        # ASPPPooling upsamples with align_corners=False; for a 1x1 source
        # that is a broadcast
        pooled = jnp.broadcast_to(pooled, x.shape[:-1]
                                  + (self.out_channels,))
        branches.append(pooled)
        h = jnp.concatenate(branches, axis=-1)
        return nn.relu(bn(nn.Conv(self.out_channels, (1, 1), use_bias=False,
                                  dtype=self.dtype)(h)))


class DeepLabV2(nn.Module):
    """Caffe-trunk DeepLab-v2 in the ARCO model contract:
    forward -> (logits, latent, fmaps) where latent is the LAYER3 output
    (deeplab.py:205 'feature = x' before layer5) and fmaps are the four
    stage outputs. ``upsample`` resizes logits to the input size for
    pixel-level training; the reference returns raw 1/8-res logits
    (deeplab.py:209) — set upsample=False for import-parity checks."""
    num_classes: int = 21
    layers: Sequence[int] = (3, 4, 6, 3)
    upsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        feats = ResNetBackbone(self.layers, caffe=True, output_stride=8,
                               dtype=self.dtype)(x, train)
        logits = ClassifierModule(self.num_classes,
                                  dtype=self.dtype)(feats[-1])
        if self.upsample:
            logits = resize_bilinear(logits, x.shape[1:-1],
                                     align_corners=False)
        return logits, feats[2], feats


class DeepLabV3Plus(nn.Module):
    """DeepLabv3Plus (deeplabv3.py:6-92) in the ARCO model contract:
    torchvision trunk at dilate_scale=16, ASPP(6/12/18), low-level project
    256->48, twin heads on the 304-ch concat. The reference returns
    (prediction, representation) at 1/4 res; here
    (logits[, upsampled], representation, [x_low, f2, f3, f4])."""
    num_classes: int = 21
    layers: Sequence[int] = (3, 4, 6, 3)
    output_dim: int = 256
    upsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn = lambda h: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype)(h)
        feats = ResNetBackbone(self.layers, caffe=False, output_stride=16,
                               dtype=self.dtype)(x, train)
        x_low, f4 = feats[0], feats[-1]
        feature = ASPP(dtype=self.dtype)(f4, train)

        proj = nn.relu(bn(nn.Conv(48, (1, 1), use_bias=False,
                                  dtype=self.dtype)(x_low)))
        up = resize_bilinear(feature, x_low.shape[1:-1], align_corners=True)
        cat = jnp.concatenate([proj, up], axis=-1)

        def twin_head(h, out_ch):
            h = nn.relu(bn(nn.Conv(256, (3, 3), padding=1, use_bias=False,
                                   dtype=self.dtype)(h)))
            return nn.Conv(out_ch, (1, 1), dtype=self.dtype)(h)

        logits = twin_head(cat, self.num_classes)
        representation = twin_head(cat, self.output_dim)
        if self.upsample:
            logits = resize_bilinear(logits, x.shape[1:-1],
                                     align_corners=False)
        return logits, representation, feats


class DeepLab2Branch(nn.Module):
    """The reference's DeepLab_2branch (models/deeplab_2branch.py:199-218):
    the same caffe-style v2 trunk, but layer4's 2048-channel output is split
    channel-wise into two 1024-channel halves — the first is returned raw as
    ``feature_instance``, the second is L2-normalized per pixel as
    ``feature_part`` and ALSO feeds the v2 sum-of-dilated-convs classifier
    (whose convs take 1024 inputs here, deeplab_2branch.py:132-148).

    Forward contract (deeplab_2branch.py:218):
        (feature_instance, feature_part, x5_logits, None)
    at 1/8 resolution; nothing is upsampled. Factory keys
    ``DeepLab_2branch`` / ``DeepLab50_2branch`` (model_factory.py:35-41)."""
    num_classes: int = 21
    layers: Sequence[int] = (3, 4, 23, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        feats = ResNetBackbone(self.layers, caffe=True, output_stride=8,
                               dtype=self.dtype)(x, train)
        x4 = feats[-1]
        c_n = x4.shape[-1] // 2
        feature_instance = x4[..., :c_n]
        x4_second = x4[..., c_n:]
        x5 = ClassifierModule(self.num_classes, dtype=self.dtype)(x4_second)
        norm = jnp.sqrt(jnp.sum(jnp.square(x4_second), axis=-1,
                                keepdims=True))
        # torch F.normalize(dim=1): eps-clamped denominator
        feature_part = x4_second / jnp.maximum(norm, 1e-12)
        return feature_instance, feature_part, x5, None


class DeepLab(DeepLabV2):
    """Back-compat alias (round-3 name)."""


def model_generator(model: str = "deeplabv2", backbone: str = "resnet101",
                    num_classes: int = 21, dtype=jnp.float32, **kw):
    """models/model_factory.py:19-61 dispatch ('DeepLab' keys are v2 with
    the caffe trunk; 'deeplabv3' is DeepLabv3Plus; 'DeepLab_2branch' /
    'DeepLab50_2branch' are the channel-split instance/part v2
    (model_factory.py:35-41 -> deeplab_2branch.py:258-265, ResNet-101
    unless the key carries '50')."""
    name = model.lower()
    if "2branch" in name:
        layers = ((3, 4, 6, 3) if "50" in name or "50" in backbone
                  else (3, 4, 23, 3))
        return DeepLab2Branch(num_classes=num_classes, layers=layers,
                              dtype=dtype, **kw)
    layers = (3, 4, 23, 3) if "101" in backbone else (3, 4, 6, 3)
    if "v3" in name:
        return DeepLabV3Plus(num_classes=num_classes, layers=layers,
                             dtype=dtype, **kw)
    return DeepLabV2(num_classes=num_classes, layers=layers, dtype=dtype,
                     **kw)


def Res50_Deeplab(num_classes: int = 21, dtype=jnp.float32) -> DeepLabV2:
    return DeepLabV2(num_classes=num_classes, layers=(3, 4, 6, 3),
                     dtype=dtype)


def Res101_Deeplab(num_classes: int = 21, dtype=jnp.float32) -> DeepLabV2:
    return DeepLabV2(num_classes=num_classes, layers=(3, 4, 23, 3),
                     dtype=dtype)


def deeplab_feature_channels(model: str, backbone: str = "resnet101"):
    """Per-stage channel widths for the ARCO FeatureExtractor over the
    returned fmaps (both backbones share the Bottleneck expansion)."""
    if "v3" in model.lower():
        return (256, 512, 1024, 2048)
    return (256, 512, 1024, 2048)
