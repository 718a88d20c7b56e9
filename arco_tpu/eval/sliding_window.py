"""3D sliding-window evaluation with device-batched windows.

Parity target: test_util.py:139-220 — pad volume to >= patch, window grid
with strides (xy=18, z=4 for LA, test_3D.py:31-33), softmax score averaging
over overlaps, argmax, unpad, optional largest-connected-component filter.

TPU-native difference: the reference runs the triple window loop with one
batch=1 forward each (test_util.py:174-202 — the HOT LOOP in SURVEY §3.4);
here windows are gathered into batches and run through one jitted forward,
with score/count accumulation in numpy on the host (cheap adds, overlapped
with device compute).
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from arco_tpu.utils.metrics import calculate_metric_percase


def window_starts(size: int, patch: int, stride: int) -> Sequence[int]:
    s = math.ceil((size - patch) / stride) + 1 if size > patch else 1
    return [min(stride * i, size - patch) for i in range(s)]


def test_single_case_3d(predict_fn: Callable, image: np.ndarray,
                        stride_xy: int, stride_z: int, patch_size,
                        num_classes: int, window_batch: int = 4):
    """image: [W, H, D]. predict_fn: jitted [B, w, h, d, 1] -> softmax
    [B, w, h, d, K]. Returns (label_map, score_map[K, W, H, D])."""
    w, h, d = image.shape
    pw = max(patch_size[0] - w, 0)
    ph = max(patch_size[1] - h, 0)
    pd = max(patch_size[2] - d, 0)
    pads = [(pw // 2, pw - pw // 2), (ph // 2, ph - ph // 2),
            (pd // 2, pd - pd // 2)]
    if pw or ph or pd:
        image = np.pad(image, pads, mode="constant")
    ww, hh, dd = image.shape

    xs = window_starts(ww, patch_size[0], stride_xy)
    ys = window_starts(hh, patch_size[1], stride_xy)
    zs = window_starts(dd, patch_size[2], stride_z)
    coords = [(x, y, z) for x in xs for y in ys for z in zs]

    score_map = np.zeros((num_classes, ww, hh, dd), np.float32)
    cnt = np.zeros((ww, hh, dd), np.float32)

    for i in range(0, len(coords), window_batch):
        chunk = coords[i:i + window_batch]
        batch = np.stack([
            image[x:x + patch_size[0], y:y + patch_size[1],
                  z:z + patch_size[2]] for (x, y, z) in chunk])
        batch = batch.astype(np.float32)[..., None]
        if batch.shape[0] < window_batch:  # keep the jitted shape static
            pad_n = window_batch - batch.shape[0]
            batch = np.concatenate(
                [batch, np.zeros((pad_n,) + batch.shape[1:], np.float32)])
        probs = np.asarray(predict_fn(jnp.asarray(batch)))[:len(chunk)]
        for (x, y, z), p in zip(chunk, probs):
            score_map[:, x:x + patch_size[0], y:y + patch_size[1],
                      z:z + patch_size[2]] += np.moveaxis(p, -1, 0)
            cnt[x:x + patch_size[0], y:y + patch_size[1],
                z:z + patch_size[2]] += 1

    score_map = score_map / cnt[None]
    label_map = np.argmax(score_map, axis=0)
    if pw or ph or pd:
        sl = np.s_[pads[0][0]:pads[0][0] + w, pads[1][0]:pads[1][0] + h,
                   pads[2][0]:pads[2][0] + d]
        label_map = label_map[sl]
        score_map = score_map[(slice(None),) + sl]
    return label_map, score_map


def largest_connected_component(segmentation: np.ndarray) -> np.ndarray:
    """getLargestCC (test_util.py:11-16)."""
    labels, n = ndimage.label(segmentation)
    if n == 0:
        return segmentation
    largest = np.argmax(np.bincount(labels.flat)[1:]) + 1
    return (labels == largest).astype(segmentation.dtype)


def evaluate_3d(cases, load_fn, predict_fn, num_classes: int,
                patch_size=(112, 112, 80), stride_xy: int = 18,
                stride_z: int = 4, use_nms: bool = False):
    """test_all_case sweep (test_util.py:38-76)."""
    metrics = []
    for case in cases:
        image, label = load_fn(case)
        pred, _ = test_single_case_3d(predict_fn, image, stride_xy, stride_z,
                                      patch_size, num_classes)
        if use_nms:
            pred = largest_connected_component(pred)
        if num_classes == 2:
            metrics.append([calculate_metric_percase(pred == 1, label == 1)])
        else:
            metrics.append([calculate_metric_percase(pred == c, label == c)
                            for c in range(1, num_classes)])
    arr = np.asarray(metrics)
    return {"per_class": arr.mean(axis=0), "mean": arr.mean(axis=(0, 1)),
            "raw": arr}
