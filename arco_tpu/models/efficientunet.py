"""EfficientUNet — EfficientNet-B3 encoder + U-Net decoder.

Parity target: networks/efficientunet.py:143-221 (Effi_UNet on the
efficient_encoder.py EfficientNet implementation, factory string
'efficient_unet'). ImageNet weights are not downloadable here (zero egress);
the encoder trains from scratch.

EfficientNet scaling for B3: width x1.2, depth x1.4, stem 40ch. MBConv
blocks use SiLU (swish), squeeze-excite ratio 0.25, BatchNorm.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from arco_tpu.ops.interpolate import resize_bilinear

# (expand_ratio, channels, repeats, stride, kernel) — EfficientNet-B0 base
B0_BLOCKS = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]


def _round_filters(f: int, width: float) -> int:
    f *= width
    new_f = max(8, int(f + 4) // 8 * 8)
    if new_f < 0.9 * f:
        new_f += 8
    return int(new_f)


def _round_repeats(r: int, depth: float) -> int:
    return int(math.ceil(depth * r))


class SqueezeExcite(nn.Module):
    reduced: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.swish(nn.Conv(self.reduced, (1, 1), dtype=self.dtype)(s))
        s = nn.sigmoid(nn.Conv(x.shape[-1], (1, 1),
                               dtype=self.dtype)(s).astype(jnp.float32))
        return x * s.astype(x.dtype)


class MBConv(nn.Module):
    cout: int
    expand: int
    stride: int
    kernel: int
    se_ratio: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn = lambda h: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, dtype=self.dtype)(h)
        cin = x.shape[-1]
        h = x
        if self.expand != 1:
            h = nn.swish(bn(nn.Conv(cin * self.expand, (1, 1),
                                    use_bias=False, dtype=self.dtype)(h)))
        h = nn.swish(bn(nn.Conv(
            h.shape[-1], (self.kernel, self.kernel),
            strides=(self.stride,) * 2, padding="SAME",
            feature_group_count=h.shape[-1], use_bias=False,
            dtype=self.dtype)(h)))
        h = SqueezeExcite(max(1, int(cin * self.se_ratio)), self.dtype)(h)
        h = bn(nn.Conv(self.cout, (1, 1), use_bias=False,
                       dtype=self.dtype)(h))
        if self.stride == 1 and cin == self.cout:
            h = h + x
        return h


class EfficientNetEncoder(nn.Module):
    """Returns the 5 feature levels at strides 2/4/8/16/32."""
    width: float = 1.2   # B3
    depth: float = 1.4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn = lambda h: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, dtype=self.dtype)(h)
        stem = _round_filters(32, self.width)
        h = nn.swish(bn(nn.Conv(stem, (3, 3), strides=(2, 2),
                                padding="SAME", use_bias=False,
                                dtype=self.dtype)(x)))
        feats = []
        for i, (e, c, r, s, k) in enumerate(B0_BLOCKS):
            cout = _round_filters(c, self.width)
            reps = _round_repeats(r, self.depth)
            for j in range(reps):
                stride = s if j == 0 else 1
                if stride == 2:
                    feats.append(h)
                h = MBConv(cout, e, stride, k, dtype=self.dtype)(h, train)
        feats.append(h)
        return feats  # [s2, s4, s8, s16, s32]


class EffiUNet(nn.Module):
    """'efficient_unet' factory entry; returns the ARCO contract."""
    num_classes: int = 4
    in_chns: int = 1
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        feats = EfficientNetEncoder(dtype=self.dtype)(x, train)
        assert len(feats) == 5
        bn = lambda h: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, dtype=self.dtype)(h)
        h = feats[-1]
        latent = h
        feature_map = [h]
        for ch, skip in zip(self.decoder_channels, feats[-2::-1] + [None]):
            h = resize_bilinear(h, tuple(2 * s for s in h.shape[1:-1]),
                                align_corners=False)
            if skip is not None:
                h = jnp.concatenate([h, skip], axis=-1)
            for _ in range(2):
                h = nn.relu(bn(nn.Conv(ch, (3, 3), padding="SAME",
                                       use_bias=False, dtype=self.dtype)(h)))
            feature_map.append(h)
        logits = nn.Conv(self.num_classes, (3, 3), padding="SAME",
                         dtype=self.dtype)(h)
        return logits, latent, feature_map
