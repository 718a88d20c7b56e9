"""VGG-19 relu-layer feature extraction.

Parity target: models/feature_extraction.py:87-220 (FeatureExtraction) —
exposes named relu activations ('relu1_1' .. 'relu5_4') of a VGG-19 trunk
for the reference-similarity flags (--ref_net vgg19 --ref_layer1 relu3_2,
train_arco_2d.py:79-84; parsed but unused by the snapshot's train loop).
ImageNet weights are not downloadable here; features come from random init
unless a local checkpoint is loaded.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from arco_tpu.models.layers import max_pool

# VGG-19 configuration: channels per conv, 'M' = maxpool
VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


def _layer_names() -> List[str]:
    names = []
    block, idx = 1, 1
    for v in VGG19_CFG:
        if v == "M":
            names.append(f"pool{block}")
            block += 1
            idx = 1
        else:
            names.append(f"relu{block}_{idx}")
            idx += 1
    return names


class VGG19Features(nn.Module):
    """Returns a dict of requested relu activations."""
    layers: Sequence[str] = ("relu3_2", "relu5_4")
    normalize_features: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        wanted = set(self.layers)
        out = {}
        names = _layer_names()
        h = x
        for name, v in zip(names, VGG19_CFG):
            if v == "M":
                h = max_pool(h)
            else:
                h = nn.relu(nn.Conv(v, (3, 3), padding="SAME",
                                    dtype=self.dtype)(h))
            if name in wanted:
                f = h
                if self.normalize_features:
                    f = f / (jnp.linalg.norm(
                        f.astype(jnp.float32), axis=-1, keepdims=True)
                        + 1e-12)
                out[name] = f
            if wanted and set(out) == wanted:
                break
        return out
