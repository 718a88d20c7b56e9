"""TransUNet (R50-ViT-B/16 hybrid) — ViT encoder over ResNet features with a
cascaded upsampling decoder.

Parity target: networks/vit_seg_modeling.py:248-457 with the
'R50-ViT-B_16' config (networks/vit_seg_configs.py): ResNet-50 stem
(3 stages, width 64, StdConv+GroupNorm), 16x16 effective patching via 1x1
patch embedding on the 1/16 feature map, 12 transformer layers (hidden 768,
mlp 3072, 12 heads), DecoderCup with skip connections from the ResNet
hybrid stem (decoder channels [256, 128, 64, 16]), SegmentationHead.

Pretrained ImageNet ViT weights are not downloadable here (zero egress);
training starts from random init. Attention uses jax.nn.dot_product_attention
(fused on TPU).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from arco_tpu.ops.interpolate import resize_bilinear


class StdConv(nn.Conv):
    """Weight-standardized conv (vit_seg_modeling_resnet_skip.py)."""

    def param(self, name, init_fn, *args):
        p = super().param(name, init_fn, *args)
        if name == "kernel":
            mean = jnp.mean(p, axis=(0, 1, 2), keepdims=True)
            var = jnp.var(p, axis=(0, 1, 2), keepdims=True)
            p = (p - mean) / jnp.sqrt(var + 1e-5)
        return p


class PreActBottleneck(nn.Module):
    """GroupNorm pre-activation bottleneck (vit_seg_modeling_resnet_skip)."""
    cout: int
    cmid: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        gn = lambda h: nn.GroupNorm(num_groups=32, dtype=self.dtype)(h)
        residual = x
        if x.shape[-1] != self.cout or self.stride != 1:
            residual = gn(StdConv(self.cout, (1, 1),
                                  strides=(self.stride,) * 2, use_bias=False,
                                  dtype=self.dtype)(x))
        y = nn.relu(gn(StdConv(self.cmid, (1, 1), use_bias=False,
                               dtype=self.dtype)(x)))
        y = nn.relu(gn(StdConv(self.cmid, (3, 3),
                               strides=(self.stride,) * 2, padding="SAME",
                               use_bias=False, dtype=self.dtype)(y)))
        y = gn(StdConv(self.cout, (1, 1), use_bias=False,
                       dtype=self.dtype)(y))
        return nn.relu(residual + y)


class ResNetV2Stem(nn.Module):
    """3-stage hybrid stem; returns (features_1_16, [skip_1_4, skip_1_8])."""
    width: int = 64
    units: Sequence[int] = (3, 4, 9)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.width
        h = StdConv(w, (7, 7), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype)(x)
        h = nn.relu(nn.GroupNorm(num_groups=32, dtype=self.dtype)(h))
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        skips = []
        widths = [w * 4, w * 8, w * 16]
        for stage, (n_units, cout) in enumerate(zip(self.units, widths)):
            stride = 1 if stage == 0 else 2
            h = PreActBottleneck(cout, cout // 4, stride, self.dtype)(h)
            for _ in range(n_units - 1):
                h = PreActBottleneck(cout, cout // 4, 1, self.dtype)(h)
            if stage < 2:
                skips.append(h)
        return h, skips[::-1]  # deepest skip first


class TransformerBlock(nn.Module):
    """Pre-LN block with the reference's dropout placement
    (vit_seg_modeling.py:85-130, vit_seg_configs.py:12-13): dropout_rate=0.1
    after the attention output projection and after BOTH MLP denses;
    attention_dropout_rate=0.0 on the attention probabilities."""
    hidden: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        det = not train
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.hidden,
            dropout_rate=self.attention_dropout_rate, deterministic=det,
            dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout_rate, deterministic=det)(h)  # proj_drop
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dropout(self.dropout_rate, deterministic=det)(h)
        h = nn.Dense(self.hidden, dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout_rate, deterministic=det)(h)
        return x + h


class DecoderBlock(nn.Module):
    """Upsample 2x + concat skip + double conv (DecoderCup,
    vit_seg_modeling.py:327-372)."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, train: bool = True):
        x = resize_bilinear(x, tuple(2 * s for s in x.shape[1:-1]),
                            align_corners=False)
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3), padding="SAME",
                        use_bias=False, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype)(x)
            x = nn.relu(x)
        return x


class VisionTransformerSeg(nn.Module):
    """'ViT_Seg' factory entry (net_factory_args.py:29-31). Returns the ARCO
    contract (logits, latent, feature maps)."""
    img_size: int = 256
    num_classes: int = 4
    in_chns: int = 1
    hidden: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    decoder_channels: Sequence[int] = (256, 128, 64, 16)
    dropout_rate: float = 0.1            # vit_seg_configs.py:13
    attention_dropout_rate: float = 0.0  # vit_seg_configs.py:12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        if x.shape[-1] == 1:  # reference repeats grayscale to 3 channels
            x = jnp.repeat(x, 3, axis=-1)
        feats, skips = ResNetV2Stem(dtype=self.dtype)(x)
        gh, gw = feats.shape[1:3]

        h = nn.Conv(self.hidden, (1, 1), dtype=self.dtype)(feats)
        tokens = h.reshape(h.shape[0], gh * gw, self.hidden)
        pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                         (1, gh * gw, self.hidden))
        tokens = tokens + pos
        tokens = nn.Dropout(self.dropout_rate,
                            deterministic=not train)(tokens)
        for _ in range(self.num_layers):
            tokens = TransformerBlock(
                self.hidden, mlp_dim=self.mlp_dim,
                num_heads=self.num_heads, dropout_rate=self.dropout_rate,
                attention_dropout_rate=self.attention_dropout_rate,
                dtype=self.dtype)(tokens, train)
        tokens = nn.LayerNorm(dtype=self.dtype)(tokens)
        latent = tokens.reshape(h.shape[0], gh, gw, self.hidden)

        # DecoderCup: conv_more then 4 decoder blocks
        d = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 dtype=self.dtype)(
            nn.Conv(512, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(latent)))
        feature_map = [d]
        skip_list = list(skips) + [None, None]
        for ch, skip in zip(self.decoder_channels, skip_list):
            d = DecoderBlock(ch, self.dtype)(d, skip, train)
            feature_map.append(d)
        logits = nn.Conv(self.num_classes, (3, 3), padding="SAME",
                         dtype=self.dtype)(d)
        return logits, latent, feature_map
