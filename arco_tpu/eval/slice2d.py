"""2D volume evaluation: slice-wise forward, volume-wise metrics.

Parity target: test_2D.py:67-132 — per case: zoom each slice to the network
size (order 0), forward, argmax, zoom back, stack, then per-class
Dice/Jaccard/HD95/ASD.

TPU-native difference: the reference runs one batch=1 device call per slice
(test_2D.py:76-88, a device round-trip per slice); here all slices of a case
run as ONE batched forward (padded to a fixed batch if needed so the jitted
program has a static shape).
"""

from __future__ import annotations

from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import zoom as nd_zoom

from arco_tpu.utils.metrics import calculate_metric_percase


def _pad_to(x: np.ndarray, batch: int) -> np.ndarray:
    if x.shape[0] == batch:
        return x
    pad = batch - x.shape[0] % batch if x.shape[0] % batch else 0
    if pad:
        x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
    return x


def test_single_volume_2d(image: np.ndarray, label: np.ndarray,
                          predict_fn: Callable, num_classes: int,
                          input_size=(256, 256), slice_batch: int = 8):
    """image/label: [D, H, W]. predict_fn: jitted [B, h, w, 1] -> argmax
    [B, h, w]. Returns (per-class metric 4-tuples, prediction volume)."""
    d, x, y = image.shape
    if (x, y) != tuple(input_size):
        zoomed = np.stack([nd_zoom(image[i], (input_size[0] / x,
                                              input_size[1] / y), order=0)
                           for i in range(d)])
    else:
        zoomed = image
    zoomed = zoomed.astype(np.float32)[..., None]

    padded = _pad_to(zoomed, slice_batch)
    preds = []
    for i in range(0, padded.shape[0], slice_batch):
        out = predict_fn(jnp.asarray(padded[i:i + slice_batch]))
        preds.append(np.asarray(out))
    pred = np.concatenate(preds)[:d]

    if (x, y) != tuple(input_size):
        pred = np.stack([nd_zoom(pred[i], (x / input_size[0],
                                           y / input_size[1]), order=0)
                         for i in range(d)])
    pred = pred.astype(label.dtype)

    metrics = []
    for c in range(1, num_classes):
        metrics.append(calculate_metric_percase(pred == c, label == c))
    return metrics, pred


def evaluate_2d(cases, load_fn, predict_fn, num_classes: int,
                input_size=(256, 256)) -> Dict[str, np.ndarray]:
    """Sweep test cases; returns mean metrics per class and overall
    (Inference, test_2D.py:105-132)."""
    all_metrics = []
    for case in cases:
        image, label = load_fn(case)
        metrics, _ = test_single_volume_2d(image, label, predict_fn,
                                           num_classes, input_size)
        all_metrics.append(metrics)
    arr = np.asarray(all_metrics)          # [cases, classes-1, 4]
    return {"per_class": arr.mean(axis=0), "mean": arr.mean(axis=(0, 1)),
            "raw": arr}
