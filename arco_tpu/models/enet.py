"""ENet — real-time 2D segmentation network.

Parity target: networks/enet.py:453-614 — initial block, 3 encoder stages
(bottlenecks with regular/dilated/asymmetric convs, PReLU in the encoder),
2 decoder stages with max-unpooling, transposed-conv full-resolution head.

TPU note: torch's max_unpool2d consumes flat argmax indices from
nn.MaxPool2d(return_indices=True). Here the 2x2 argmax is computed as a
4-way one-hot per pooled pixel and the unpool is a broadcast-multiply +
reshape interleave — pure static-shape XLA, no scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class PReLU(nn.Module):
    """torch nn.PReLU() default: ONE shared learnable slope (enet.py uses
    the no-arg constructor everywhere, so num_parameters=1)."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25), (1,))
        return jnp.where(x >= 0, x, alpha * x).astype(x.dtype)


def _act(relu: bool):
    return (lambda m, x: nn.relu(x)) if relu else \
        (lambda m, x: PReLU()(x))


def max_pool_with_onehot(x):
    """2x2/2 max pool returning (pooled, onehot [N,H/2,W/2,C,4])."""
    n, h, w, c = x.shape
    blocks = x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 5, 2, 4)
    blocks = blocks.reshape(n, h // 2, w // 2, c, 4)
    idx = jnp.argmax(blocks, axis=-1)
    pooled = jnp.max(blocks, axis=-1)
    return pooled, jax.nn.one_hot(idx, 4, dtype=x.dtype)


def max_unpool(x, onehot):
    """Inverse of max_pool_with_onehot: place values at their argmax slots."""
    n, h2, w2, c = x.shape
    blocks = x[..., None] * onehot                   # [N,H2,W2,C,4]
    blocks = blocks.reshape(n, h2, w2, c, 2, 2).transpose(0, 1, 4, 2, 5, 3)
    return blocks.reshape(n, h2 * 2, w2 * 2, c)


class InitialBlock(nn.Module):
    """Conv3x3/s2 (out-3 ch) concat 2x2 maxpool (enet.py:5-68)."""
    out_channels: int = 16
    relu: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        # torch k3/s2/p1 pads (1,1); flax SAME would pad (0,1) on even
        # inputs, shifting every window by one
        main = nn.Conv(self.out_channels - x.shape[-1], (3, 3),
                       strides=(2, 2), padding=((1, 1), (1, 1)),
                       use_bias=False, dtype=self.dtype)(x)
        # reference ext branch is MaxPool2d(3, stride=2, padding=1)
        # (enet.py:50), NOT a 2x2 pool — overlapping 3x3 windows
        ext = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        out = jnp.concatenate([main, ext], axis=-1)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           dtype=self.dtype)(out)
        return _act(self.relu)(self, out)


class RegularBottleneck(nn.Module):
    """1x1 reduce -> (regular | dilated | asymmetric 5x1+1x5) -> 1x1 expand
    with residual add (enet.py:71-207)."""
    channels: int
    internal_ratio: int = 4
    kernel_size: int = 3
    dilation: int = 1
    asymmetric: bool = False
    dropout_prob: float = 0.0
    relu: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = _act(self.relu)
        internal = self.channels // self.internal_ratio
        bn = lambda h: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, dtype=self.dtype)(h)
        h = act(self, bn(nn.Conv(internal, (1, 1), use_bias=False,
                                 dtype=self.dtype)(x)))
        k = self.kernel_size
        if self.asymmetric:
            # reference ext_conv2 (enet.py:151-167): BN + activation after
            # EACH of the (k,1) and (1,k) halves
            h = act(self, bn(nn.Conv(internal, (k, 1), padding="SAME",
                                     use_bias=False, dtype=self.dtype)(h)))
            h = act(self, bn(nn.Conv(internal, (1, k), padding="SAME",
                                     use_bias=False, dtype=self.dtype)(h)))
        else:
            h = act(self, bn(nn.Conv(
                internal, (k, k), padding="SAME",
                kernel_dilation=(self.dilation, self.dilation),
                use_bias=False, dtype=self.dtype)(h)))
        # reference ext_conv3 ends in an activation too (enet.py:180-186)
        h = act(self, bn(nn.Conv(self.channels, (1, 1), use_bias=False,
                                 dtype=self.dtype)(h)))
        h = nn.Dropout(self.dropout_prob, deterministic=not train)(h)
        return act(self, x + h)


class DownsamplingBottleneck(nn.Module):
    """Main: maxpool (+ zero-pad channels); ext: conv/s2 path
    (enet.py:209-338). Returns (out, pooling one-hot)."""
    in_channels: int
    out_channels: int
    dropout_prob: float = 0.0
    relu: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = _act(self.relu)
        bn = lambda h: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, dtype=self.dtype)(h)
        # reference: internal_channels = in_channels // internal_ratio
        # (enet.py:258)
        internal = self.in_channels // 4
        main, onehot = max_pool_with_onehot(x)
        pad = self.out_channels - self.in_channels
        main = jnp.pad(main, ((0, 0), (0, 0), (0, 0), (0, pad)))

        h = act(self, bn(nn.Conv(internal, (2, 2), strides=(2, 2),
                                 use_bias=False, dtype=self.dtype)(x)))
        h = act(self, bn(nn.Conv(internal, (3, 3), padding="SAME",
                                 use_bias=False, dtype=self.dtype)(h)))
        h = act(self, bn(nn.Conv(self.out_channels, (1, 1), use_bias=False,
                                 dtype=self.dtype)(h)))
        h = nn.Dropout(self.dropout_prob, deterministic=not train)(h)
        return act(self, main + h), onehot


class UpsamplingBottleneck(nn.Module):
    """Main: 1x1 conv + max-unpool; ext: transposed conv path
    (enet.py:340-451)."""
    in_channels: int
    out_channels: int
    dropout_prob: float = 0.0
    relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, onehot, train: bool = True):
        act = _act(self.relu)
        bn = lambda h: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, dtype=self.dtype)(h)
        # reference: internal_channels = in_channels // internal_ratio
        # (enet.py:388)
        internal = self.in_channels // 4
        main = bn(nn.Conv(self.out_channels, (1, 1), use_bias=False,
                          dtype=self.dtype)(x))
        main = max_unpool(main, onehot)

        h = act(self, bn(nn.Conv(internal, (1, 1), use_bias=False,
                                 dtype=self.dtype)(x)))
        # torch ConvTranspose2d(k=2, s=2, p=0) == VALID here
        h = act(self, bn(nn.ConvTranspose(internal, (2, 2), strides=(2, 2),
                                          padding="VALID", use_bias=False,
                                          dtype=self.dtype)(h)))
        h = act(self, bn(nn.Conv(self.out_channels, (1, 1), use_bias=False,
                                 dtype=self.dtype)(h)))
        h = nn.Dropout(self.dropout_prob, deterministic=not train)(h)
        return act(self, main + h)


class ENet(nn.Module):
    in_channels: int = 1
    num_classes: int = 2
    encoder_relu: bool = False
    decoder_relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        er, dr, dt = self.encoder_relu, self.decoder_relu, self.dtype
        h = InitialBlock(16, er, dt)(x, train)

        h, oh1 = DownsamplingBottleneck(16, 64, 0.01, er, dt)(h, train)
        for _ in range(4):
            h = RegularBottleneck(64, dropout_prob=0.01, relu=er,
                                  dtype=dt)(h, train)

        h, oh2 = DownsamplingBottleneck(64, 128, 0.1, er, dt)(h, train)

        def stage23(h):
            h = RegularBottleneck(128, dropout_prob=0.1, relu=er,
                                  dtype=dt)(h, train)
            h = RegularBottleneck(128, dilation=2, dropout_prob=0.1, relu=er,
                                  dtype=dt)(h, train)
            h = RegularBottleneck(128, kernel_size=5, asymmetric=True,
                                  dropout_prob=0.1, relu=er, dtype=dt)(h,
                                                                       train)
            h = RegularBottleneck(128, dilation=4, dropout_prob=0.1, relu=er,
                                  dtype=dt)(h, train)
            h = RegularBottleneck(128, dropout_prob=0.1, relu=er,
                                  dtype=dt)(h, train)
            h = RegularBottleneck(128, dilation=8, dropout_prob=0.1, relu=er,
                                  dtype=dt)(h, train)
            h = RegularBottleneck(128, kernel_size=5, asymmetric=True,
                                  dropout_prob=0.1, relu=er, dtype=dt)(h,
                                                                       train)
            h = RegularBottleneck(128, dilation=16, dropout_prob=0.1,
                                  relu=er, dtype=dt)(h, train)
            return h

        h = stage23(h)          # stage 2
        latent = h
        h = stage23(h)          # stage 3 (same layout minus first downsample)

        h = UpsamplingBottleneck(128, 64, 0.1, dr, dt)(h, oh2, train)
        h = RegularBottleneck(64, dropout_prob=0.1, relu=dr, dtype=dt)(h,
                                                                       train)
        h = RegularBottleneck(64, dropout_prob=0.1, relu=dr, dtype=dt)(h,
                                                                       train)
        f64 = h
        h = UpsamplingBottleneck(64, 16, 0.1, dr, dt)(h, oh1, train)
        h = RegularBottleneck(16, dropout_prob=0.1, relu=dr, dtype=dt)(h,
                                                                       train)
        f16 = h
        # torch ConvTranspose2d(k=3, s=2, p=1, output_size=2*in) -> op=1:
        # dilated input padded (k-1-p)=1 low, (k-1-p)+op=2 high
        logits = nn.ConvTranspose(self.num_classes, (3, 3), strides=(2, 2),
                                  padding=((1, 2), (1, 2)), use_bias=False,
                                  dtype=dt)(h)
        return logits, latent, [latent, f64, f16]
