"""PNet2D — dilated-convolution pyramid network (DeepIGeoS).

Parity target: networks/pnet.py:87-122 — five dilated PNetBlocks
(dilations from `ratios`, default [1,2,4,8,16], 64 filters), concat of all
five block outputs, 1x1 ConcatBlock fuse, dropout output head.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from arco_tpu.models.layers import leaky_relu


class PNetBlock(nn.Module):
    features: int
    dilation: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3), padding="SAME",
                        kernel_dilation=(self.dilation, self.dilation),
                        dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype)(x)
            x = leaky_relu(x)
        return x


class PNet2D(nn.Module):
    in_chns: int = 1
    num_classes: int = 2
    num_filters: int = 64
    ratios: Sequence[int] = (1, 2, 4, 8, 16)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        feats = []
        h = x
        for r in self.ratios:
            h = PNetBlock(self.num_filters, r, self.dtype)(h, train)
            feats.append(h)
        conx = jnp.concatenate(feats, axis=-1)
        # ConcatBlock (pnet.py:44-61)
        conx = leaky_relu(nn.Conv(conx.shape[-1], (1, 1),
                                  dtype=self.dtype)(conx))
        conx = leaky_relu(nn.Conv(self.num_filters * 2, (1, 1),
                                  dtype=self.dtype)(conx))
        # OutPutBlock (pnet.py:64-84)
        h = nn.Dropout(0.3, deterministic=not train)(conx)
        h = leaky_relu(nn.Conv(self.num_filters, (1, 1), dtype=self.dtype)(h))
        h = nn.Dropout(0.3, deterministic=not train)(h)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype)(h)
        # ARCO forward contract: (logits, latent, feature maps)
        return logits, feats[-1], feats
