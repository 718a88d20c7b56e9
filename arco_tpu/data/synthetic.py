"""Synthetic dataset generators for tests and benchmarks.

Creates ACDC-shaped (2D h5 slices + volumes) and LA-shaped (3D h5 volumes)
directory trees so every entry point can run end-to-end without real data —
the smoke-train strategy SURVEY.md §4 prescribes.
"""

from __future__ import annotations

import os

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


def _shape_image(rng, size, num_classes):
    """Image with per-class blobs so segmentation is learnable."""
    h, w = size
    label = np.zeros((h, w), np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    for c in range(1, num_classes):
        cy, cx = rng.randint(h // 4, 3 * h // 4), rng.randint(w // 4,
                                                              3 * w // 4)
        r = rng.randint(h // 10, h // 5)
        label[(yy - cy) ** 2 + (xx - cx) ** 2 < r * r] = c
    image = (label.astype(np.float32) / max(num_classes - 1, 1)
             + 0.08 * rng.randn(h, w).astype(np.float32))
    image = np.clip(image, 0, 1.5)
    return image, label


def make_acdc_like(root: str, n_train: int = 24, n_val: int = 2,
                   size=(64, 64), num_classes: int = 4, depth: int = 4,
                   seed: int = 0):
    """ACDC layout: <root>/train_slices.list, data/slices/<case>.h5 (2D),
    val.list + data/<case>.h5 (3D volumes for eval)."""
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "data", "slices"), exist_ok=True)
    cases = []
    for i in range(n_train):
        case = f"patient{i:03d}_frame01_slice_{i % 8}"
        image, label = _shape_image(rng, size, num_classes)
        with h5py.File(os.path.join(root, "data", "slices",
                                    f"{case}.h5"), "w") as f:
            f.create_dataset("image", data=image)
            f.create_dataset("label", data=label)
        cases.append(case)
    with open(os.path.join(root, "train_slices.list"), "w") as f:
        f.write("\n".join(cases) + "\n")

    vol_cases = []
    for i in range(n_val):
        case = f"patient{100 + i:03d}_volume"
        pairs = [_shape_image(rng, size, num_classes) for _ in range(depth)]
        image = np.stack([p[0] for p in pairs])
        label = np.stack([p[1] for p in pairs])
        with h5py.File(os.path.join(root, "data", f"{case}.h5"), "w") as f:
            f.create_dataset("image", data=image)
            f.create_dataset("label", data=label)
        vol_cases.append(case)
    with open(os.path.join(root, "val.list"), "w") as f:
        f.write("\n".join(vol_cases) + "\n")
    with open(os.path.join(root, "test.list"), "w") as f:
        f.write("\n".join(vol_cases) + "\n")
    return root


def make_la_like(root: str, n_train: int = 8, size=(48, 48, 32),
                 seed: int = 0):
    """LA layout: <root>/train.list + <case>/mri_norm2.h5 volumes."""
    rng = np.random.RandomState(seed)
    cases = []
    h, w, d = size
    for i in range(n_train):
        case = f"la_case_{i:03d}"
        os.makedirs(os.path.join(root, case), exist_ok=True)
        label = np.zeros(size, np.uint8)
        cy, cx, cz = (rng.randint(h // 4, 3 * h // 4),
                      rng.randint(w // 4, 3 * w // 4),
                      rng.randint(d // 4, 3 * d // 4))
        r = rng.randint(min(size) // 8, min(size) // 4)
        yy, xx, zz = np.mgrid[0:h, 0:w, 0:d]
        label[(yy - cy) ** 2 + (xx - cx) ** 2 + (zz - cz) ** 2 < r * r] = 1
        image = (label.astype(np.float32)
                 + 0.2 * rng.randn(*size).astype(np.float32))
        with h5py.File(os.path.join(root, case, "mri_norm2.h5"), "w") as f:
            f.create_dataset("image", data=image)
            f.create_dataset("label", data=label)
        cases.append(case)
    with open(os.path.join(root, "train.list"), "w") as f:
        f.write("\n".join(cases) + "\n")
    with open(os.path.join(root, "test.list"), "w") as f:
        f.write("\n".join(cases[:2]) + "\n")
    return root
