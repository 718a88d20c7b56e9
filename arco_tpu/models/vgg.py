"""VGG feature extraction + deepcluster_vgg16.

Parity targets:
- models/feature_extraction.py:87-220 (FeatureExtraction) — exposes named
  relu activations ('relu1_1' .. 'relu5_4') of a VGG-19 trunk for the
  reference-similarity flags (--ref_net vgg19 --ref_layer1 relu3_2,
  train_arco_2d.py:79-84; parsed but unused by the snapshot's train loop).
- models/deepcluster_vgg16.py:1-87 (VGG/vgg16) — the DeepCluster VGG-16:
  optional fixed (non-trainable) grayscale+Sobel stem, conv trunk with
  BatchNorm, 4096-4096 classifier MLP, detachable top_layer.

ImageNet weights are not downloadable here (zero egress); local torch
checkpoints are ingested via compat.torch_import_zoo
(convert_vgg19_features_state_dict / convert_deepcluster_vgg16_state_dict).
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


# VGG-16 configuration (deepcluster_vgg16.py:72 make_layers cfg)
VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]

# fixed Sobel stem kernels (deepcluster_vgg16.py:27-34), HWIO
_SOBEL_X = jnp.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], jnp.float32)
_SOBEL_Y = jnp.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], jnp.float32)
_SOBEL_KERNEL = jnp.stack([_SOBEL_X, _SOBEL_Y], axis=-1)[:, :, None, :]


def sobel_stem(x):
    """The reference's frozen grayscale (1x1 conv, weights 1/3, bias 0) +
    Sobel filter pair (deepcluster_vgg16.py:23-37). Constants, not params —
    the torch version sets requires_grad=False on them."""
    import jax

    gray = jnp.mean(x, axis=-1, keepdims=True)
    return jax.lax.conv_general_dilated(
        gray.astype(jnp.float32), _SOBEL_KERNEL, (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    ).astype(x.dtype)


class DeepClusterVGG16(nn.Module):
    """deepcluster_vgg16.py VGG: [sobel] -> conv trunk -> flatten ->
    Linear(25088,4096)/ReLU/Dropout/Linear(4096,4096)/ReLU ->
    top_layer Linear(4096, num_classes). include_top=False reproduces the
    DeepCluster pattern of detaching top_layer (``if self.top_layer``,
    deepcluster_vgg16.py:47-48) and returns the 4096-d embedding."""
    num_classes: int = 1000
    sobel: bool = False
    batch_norm: bool = True
    include_top: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.sobel:
            x = sobel_stem(x)
        h = x
        for v in VGG16_CFG:
            if v == "M":
                h = max_pool(h)
            else:
                h = nn.Conv(v, (3, 3), padding="SAME", dtype=self.dtype)(h)
                if self.batch_norm:
                    h = nn.BatchNorm(use_running_average=not train,
                                     momentum=0.9, epsilon=1e-5,
                                     dtype=self.dtype)(h)
                h = nn.relu(h)
        # torch flattens NCHW (channel-major); keep NHWC order here and let
        # the state_dict converter permute the first Linear instead
        h = h.reshape(h.shape[0], -1)
        h = nn.relu(nn.Dense(4096, dtype=self.dtype)(h))
        h = nn.Dropout(0.5, deterministic=not train)(h)
        h = nn.relu(nn.Dense(4096, dtype=self.dtype)(h))
        if self.include_top:
            h = nn.Dense(self.num_classes, dtype=self.dtype)(h)
        return h
