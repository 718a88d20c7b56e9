"""Offline preprocessing recipes.

Parity targets:
- cityscapes_preprocessing.py: resize images to 1024x512 (bilinear) and
  labels (nearest) into <root>/images,labels trees;
- pascal_preprocessing.py:36-56: partial-label masks grown by iterative
  dilation from one random seed pixel per instance ('p0.x' label regimes);
- med_preprocessing.py:4-32: CT window clipping + normalization and MRI
  percentile clipping.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np
from scipy import ndimage


def ct_window_normalize(volume: np.ndarray, wl: float = 50.0,
                        ww: float = 400.0) -> np.ndarray:
    """CT windowing (med_preprocessing.py:4-15): clip to [wl-ww/2, wl+ww/2]
    then scale to [0, 1]."""
    lo, hi = wl - ww / 2.0, wl + ww / 2.0
    v = np.clip(volume.astype(np.float32), lo, hi)
    return (v - lo) / (hi - lo)


def mri_percentile_clip(volume: np.ndarray, low: float = 0.5,
                        high: float = 99.5) -> np.ndarray:
    """MRI percentile clipping + z-score (med_preprocessing.py:17-32)."""
    lo, hi = np.percentile(volume, [low, high])
    v = np.clip(volume.astype(np.float32), lo, hi)
    return (v - v.mean()) / (v.std() + 1e-8)


def partial_label_mask(rng: np.random.RandomState, label: np.ndarray,
                       fraction: float = 0.1,
                       ignore_index: int = 255) -> np.ndarray:
    """Grow a partial mask from one seed pixel per class region by binary
    dilation until ~fraction of the region is labeled
    (pascal_preprocessing.py:36-56); everything else becomes ignore."""
    out = np.full_like(label, ignore_index)
    for cls in np.unique(label):
        if cls == ignore_index:
            continue
        region = label == cls
        n_target = max(int(region.sum() * fraction), 1)
        ys, xs = np.nonzero(region)
        seed_i = rng.randint(len(ys))
        grown = np.zeros_like(region)
        grown[ys[seed_i], xs[seed_i]] = True
        struct = ndimage.generate_binary_structure(2, 2)
        while grown.sum() < n_target:
            new = ndimage.binary_dilation(grown, struct) & region
            if new.sum() == grown.sum():
                break
            grown = new
        out[grown] = cls
    return out


def resize_cityscapes_pair(image: np.ndarray, label: np.ndarray,
                           size: Tuple[int, int] = (512, 1024)):
    """Bilinear image / nearest label resize
    (cityscapes_preprocessing.py)."""
    h, w = label.shape
    zh, zw = size[0] / h, size[1] / w
    img = np.stack([ndimage.zoom(image[..., c], (zh, zw), order=1)
                    for c in range(image.shape[-1])], axis=-1)
    lab = ndimage.zoom(label, (zh, zw), order=0)
    return img, lab
