"""2D U-Net family — ARCO's main 2D backbone, rebuilt in flax (channels-last).

Parity target: networks/unetWithArgs.py:309-430 —
channels [16, 32, 64, 128, 256], encoder dropout [0.05, 0.1, 0.2, 0.3, 0.5],
maxpool downsampling, ConvTranspose(k=2,s=2) upsampling (bilinear=False at
unetWithArgs.py:317), decoder dropout 0, 3x3 output conv.

Forward contract (unetWithArgs.py:345-348):
    logits, bottleneck_latent, [5 decoder feature maps coarse->fine]
Feature-map channels: [256, 128, 64, 32, 16] at strides [16, 8, 4, 2, 1].

Variants, mirroring the reference factory strings (net_factory_args.py:14-38):
- UNet          (unet)
- UNetCCT       (unet_cct): main decoder + 3 aux decoders over perturbed
  encoder features (unetWithArgs.py:351-377)
- UNetDS        (unet_ds): deep supervision heads (unetWithArgs.py:400-417)
- UNetURPC      (unet_urpc): multi-scale outputs with noise-perturbed decoder
  (unetWithArgs.py:379-398)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from arco_tpu.models.layers import (BilinearUp, ConvBlock2D,
                                    ConvTransposeUp, FeaturePerturbation,
                                    max_pool)
from arco_tpu.ops.interpolate import resize_bilinear


class Encoder(nn.Module):
    ft_chns: Sequence[int] = (16, 32, 64, 128, 256)
    dropout: Sequence[float] = (0.05, 0.1, 0.2, 0.3, 0.5)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        feats = []
        x = ConvBlock2D(self.ft_chns[0], self.dropout[0], self.dtype)(x, train)
        feats.append(x)
        for ch, p in zip(self.ft_chns[1:], self.dropout[1:]):
            x = max_pool(x)
            x = ConvBlock2D(ch, p, self.dtype)(x, train)
            feats.append(x)
        return feats


class Decoder(nn.Module):
    """Up path; returns (logits, [x4, up1, up2, up3, up4])
    (unetWithArgs.py:142-158).

    Upsampling is conv1x1 + bilinear (UpBlock's default path): the
    reference's Decoder never forwards its bilinear=False param
    (unetWithArgs.py:130-138 vs :317) — see layers.BilinearUp."""
    ft_chns: Sequence[int] = (16, 32, 64, 128, 256)
    n_class: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = True):
        x0, x1, x2, x3, x4 = feats
        feature_map = [x4]
        x = x4
        for skip, ch in zip((x3, x2, x1, x0), self.ft_chns[-2::-1]):
            x = BilinearUp(ch, self.dtype)(x)
            x = jnp.concatenate([skip, x], axis=-1)
            x = ConvBlock2D(ch, 0.0, self.dtype)(x, train)
            feature_map.append(x)
        logits = nn.Conv(self.n_class, (3, 3), padding="SAME",
                         dtype=self.dtype)(x)
        return logits, feature_map


class UNet(nn.Module):
    in_chns: int = 1
    class_num: int = 4
    ft_chns: Sequence[int] = (16, 32, 64, 128, 256)
    dropout: Sequence[float] = (0.05, 0.1, 0.2, 0.3, 0.5)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        feats = Encoder(self.ft_chns, self.dropout, self.dtype)(x, train)
        logits, feature_map = Decoder(self.ft_chns, self.class_num,
                                      self.dtype)(feats, train)
        return logits, feats[-1], feature_map


class UNetCCT(nn.Module):
    """Cross-consistency-training variant: one shared encoder, a main decoder
    and three aux decoders on perturbed features (unetWithArgs.py:351-377).
    Returns (main_logits, aux1, aux2, aux3)."""
    in_chns: int = 1
    class_num: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        feats = Encoder(dtype=self.dtype)(x, train)
        main_logits, _ = Decoder(n_class=self.class_num,
                                 dtype=self.dtype)(feats, train)
        perturb = [FeaturePerturbation.feature_noise,
                   FeaturePerturbation.dropout,
                   FeaturePerturbation.feature_dropout]
        outs = [main_logits]
        for k, fn in enumerate(perturb):
            rng = self.make_rng("perturb") if train else jax.random.PRNGKey(k)
            pfeats = [fn(jax.random.fold_in(rng, i), f)
                      for i, f in enumerate(feats)]
            aux_logits, _ = Decoder(n_class=self.class_num, dtype=self.dtype,
                                    name=f"aux_decoder{k + 1}")(pfeats, train)
            outs.append(aux_logits)
        return tuple(outs)


class UNetDS(nn.Module):
    """Deep-supervision variant (unetWithArgs.py:400-417): per-stage 3x3 seg
    heads upsampled to input size. Returns (logits, dp3, dp2, dp1)."""
    in_chns: int = 1
    class_num: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        size = x.shape[1:3]
        feats = Encoder(dtype=self.dtype)(x, train)
        logits, fmap = Decoder(n_class=self.class_num, dtype=self.dtype)(feats,
                                                                         train)
        outs = [logits]
        for name, f in zip(("dp3", "dp2", "dp1"), fmap[1:4]):
            head = nn.Conv(self.class_num, (3, 3), padding="SAME",
                           dtype=self.dtype, name=f"out_conv_{name}")(f)
            outs.append(resize_bilinear(head, size, align_corners=False))
        return tuple(outs)


class UNetURPC(nn.Module):
    """Uncertainty-rectified pyramid-consistency variant
    (unetWithArgs.py:379-398): multi-scale heads with feature noise."""
    in_chns: int = 1
    class_num: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        size = x.shape[1:3]
        feats = Encoder(dtype=self.dtype)(x, train)
        logits, fmap = Decoder(n_class=self.class_num, dtype=self.dtype)(feats,
                                                                         train)
        outs = [logits]
        for k, (name, f) in enumerate(zip(("dp3", "dp2", "dp1"), fmap[1:4])):
            if train:
                rng = self.make_rng("perturb")
                f = FeaturePerturbation.feature_noise(rng, f)
            head = nn.Conv(self.class_num, (3, 3), padding="SAME",
                           dtype=self.dtype, name=f"out_conv_{name}")(f)
            outs.append(resize_bilinear(head, size, align_corners=False))
        return tuple(outs)
