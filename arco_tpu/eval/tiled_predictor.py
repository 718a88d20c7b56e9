"""nnU-Net-style tiled prediction: gaussian importance weighting + mirror TTA.

Parity target: SegmentationNetwork (networks/neural_network.py:70-600) —
- `_get_gaussian` (:274-290): gaussian importance map centered in the patch,
  sigma = patch_size/8, normalized to max 1, zeros replaced by the min
  nonzero value;
- `_compute_steps_for_sliding_window` (:292-319): evenly spaced window starts
  with target step = patch * step_size;
- `_internal_maybe_mirror_and_pred_3D` (:553-600): averaged softmax over the
  2^m mirror combinations of the chosen axes;
- tiled accumulation of weighted softmax + weight normalization (:321-476).

TPU-native difference: windows run as device batches through one jitted
forward; mirroring is done on device by flipping the batch.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from scipy.ndimage import gaussian_filter


def get_gaussian(patch_size: Sequence[int],
                 sigma_scale: float = 1.0 / 8) -> np.ndarray:
    """neural_network.py:274-290."""
    tmp = np.zeros(patch_size)
    center = [i // 2 for i in patch_size]
    sigmas = [i * sigma_scale for i in patch_size]
    tmp[tuple(center)] = 1
    g = gaussian_filter(tmp, sigmas, mode="constant", cval=0)
    g = g / g.max()
    g = g.astype(np.float32)
    g[g == 0] = g[g != 0].min()
    return g


def compute_steps_for_sliding_window(patch_size, image_size,
                                     step_size: float = 0.5):
    """neural_network.py:292-319."""
    assert all(i >= j for i, j in zip(image_size, patch_size))
    target_step_sizes = [i * step_size for i in patch_size]
    num_steps = [int(np.ceil((i - k) / s)) + 1
                 for i, k, s in zip(image_size, patch_size,
                                    target_step_sizes)]
    steps = []
    for dim in range(len(patch_size)):
        max_start = image_size[dim] - patch_size[dim]
        if num_steps[dim] > 1:
            actual = max_start / (num_steps[dim] - 1)
        else:
            actual = 1e9
        steps.append([int(np.round(actual * i)) if max_start > 0 else 0
                      for i in range(num_steps[dim])])
    return steps


def _mirror_axes_combinations(mirror_axes):
    combos = [()]
    for ax in mirror_axes:
        combos = combos + [c + (ax,) for c in combos]
    return combos


def predict_tiled(predict_fn: Callable, image: np.ndarray, patch_size,
                  num_classes: int, step_size: float = 0.5,
                  use_gaussian: bool = True, mirror_axes=(0, 1, 2),
                  window_batch: int = 2):
    """image: [*spatial]. predict_fn: jitted [B, *patch, 1] -> softmax
    [B, *patch, K]. Returns (label_map, class-first score_map)."""
    nd = len(patch_size)
    pads = []
    for s, p in zip(image.shape, patch_size):
        d = max(p - s, 0)
        pads.append((d // 2, d - d // 2))
    padded = np.pad(image, pads, mode="constant") if any(
        p != (0, 0) for p in pads) else image

    steps = compute_steps_for_sliding_window(patch_size, padded.shape,
                                             step_size)
    coords = [(x, y, z) for x in steps[0] for y in steps[1]
              for z in steps[2]] if nd == 3 else \
             [(x, y) for x in steps[0] for y in steps[1]]

    gauss = get_gaussian(patch_size) if use_gaussian else \
        np.ones(patch_size, np.float32)
    combos = _mirror_axes_combinations(mirror_axes[:nd])

    agg = np.zeros((num_classes,) + padded.shape, np.float32)
    weights = np.zeros(padded.shape, np.float32)

    def slices(c):
        return tuple(slice(s, s + p) for s, p in zip(c, patch_size))

    for i in range(0, len(coords), window_batch):
        chunk = coords[i:i + window_batch]
        batch = np.stack([padded[slices(c)] for c in chunk])[..., None]
        if batch.shape[0] < window_batch:
            batch = np.concatenate([batch, np.zeros(
                (window_batch - batch.shape[0],) + batch.shape[1:],
                np.float32)])
        batch = batch.astype(np.float32)

        prob_sum = np.zeros((len(chunk),) + tuple(patch_size)
                            + (num_classes,), np.float32)
        for combo in combos:
            axes = tuple(a + 1 for a in combo)  # spatial axes after batch
            flipped = np.flip(batch, axes) if combo else batch
            probs = np.asarray(predict_fn(jnp.asarray(flipped)))[:len(chunk)]
            probs = np.flip(probs, axes) if combo else probs
            prob_sum += probs
        prob_sum /= len(combos)

        for c, p in zip(chunk, prob_sum):
            sl = slices(c)
            agg[(slice(None),) + sl] += np.moveaxis(p, -1, 0) * gauss
            weights[sl] += gauss

    agg = agg / weights[None]
    # unpad
    sl = tuple(slice(p[0], p[0] + s) for p, s in zip(pads, image.shape))
    agg = agg[(slice(None),) + sl]
    return np.argmax(agg, axis=0), agg


def predict_3d_via_2d(predict_fn: Callable, volume: np.ndarray,
                      patch_size2d, num_classes: int,
                      step_size: float = 0.5, use_gaussian: bool = True,
                      mirror_axes=(0, 1), window_batch: int = 2):
    """3D prediction with a 2D network: run the tiled 2D predictor on every
    z-slice and stack (neural_network.py:190-270 predict_2D dispatching to
    _internal_predict_3D_2Dconv_tiled :478-551 for 3D inputs).

    volume: [Z, H, W]. Returns (label_map [Z, H, W],
    class-first score_map [K, Z, H, W])."""
    labels, scores = [], []
    for z in range(volume.shape[0]):
        lab, sc = predict_tiled(predict_fn, volume[z], patch_size2d,
                                num_classes, step_size, use_gaussian,
                                mirror_axes, window_batch)
        labels.append(lab)
        scores.append(sc)
    return np.stack(labels), np.stack(scores, axis=1)
