"""Host-side 2D transform utilities completing the dataloaders/dataset.py
transform inventory (CenterCrop :203, RandomCrop :234, RandomNoise :367,
RandomColorJitter :385, BrightnessTransform :440, CreateOnehotLabel :406,
Resize :431, CustomMultiCropping :512).

The train paths apply photometrics on device (arco_tpu.augment); these numpy
versions serve dataset-level pipelines and notebook use.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
from scipy import ndimage


def center_crop(image, label, output_size):
    """dataset.py:203-231 (pads by half-deficit + 3 like the reference)."""
    if (label.shape[0] <= output_size[0]
            or label.shape[1] <= output_size[1]):
        pw = max((output_size[0] - label.shape[0]) // 2 + 3, 0)
        ph = max((output_size[1] - label.shape[1]) // 2 + 3, 0)
        image = np.pad(image, [(pw, pw), (ph, ph)], mode="constant")
        label = np.pad(label, [(pw, pw), (ph, ph)], mode="constant")
    w, h = image.shape
    w1 = int(round((w - output_size[0]) / 2.0))
    h1 = int(round((h - output_size[1]) / 2.0))
    sl = np.s_[w1:w1 + output_size[0], h1:h1 + output_size[1]]
    return image[sl], label[sl]


def random_crop(rng, image, label, output_size):
    """dataset.py:234-262."""
    if (label.shape[0] <= output_size[0]
            or label.shape[1] <= output_size[1]):
        pw = max((output_size[0] - label.shape[0]) // 2 + 3, 0)
        ph = max((output_size[1] - label.shape[1]) // 2 + 3, 0)
        image = np.pad(image, [(pw, pw), (ph, ph)], mode="constant")
        label = np.pad(label, [(pw, pw), (ph, ph)], mode="constant")
    w, h = image.shape
    w1 = rng.randint(0, w - output_size[0] + 1)
    h1 = rng.randint(0, h - output_size[1] + 1)
    sl = np.s_[w1:w1 + output_size[0], h1:h1 + output_size[1]]
    return image[sl], label[sl]


def random_noise(rng, image, p: float = 0.5, sigma_range=(0.15, 1.15)):
    """dataset.py:367-382 (PIL gaussian blur analog: gaussian filter)."""
    if rng.random_sample() < p:
        sigma = rng.uniform(*sigma_range)
        image = ndimage.gaussian_filter(image, sigma)
    return image


def random_color_jitter(rng, image, p: float = 0.5,
                        color=(0.2, 0.2, 0.2, 0.1)):
    """dataset.py:385-403: brightness/contrast jitter for grayscale."""
    if rng.random_sample() < p:
        b = 1.0 + rng.uniform(-color[0], color[0])
        image = image * b
        c = 1.0 + rng.uniform(-color[1], color[1])
        image = image.mean() + (image - image.mean()) * c
    return image


def brightness_transform(rng, image, mu_range=(0.9, 1.1),
                         sigma: float = 0.1):
    """dataset.py:440-453: clamp(mu*x + sigma, 0, 1)."""
    mu = rng.uniform(*mu_range)
    return np.clip(mu * image + sigma, 0.0, 1.0)


def create_onehot_label(label, num_classes: int):
    """dataset.py:406-415."""
    return np.stack([(label == c).astype(np.float32)
                     for c in range(num_classes)])


def resize(image, label, output_size):
    """dataset.py:431-438 (zoom order 0)."""
    x, y = image.shape
    image = ndimage.zoom(image, (output_size[0] / x, output_size[1] / y),
                         order=0)
    label = ndimage.zoom(label, (output_size[0] / x, output_size[1] / y),
                         order=0)
    return image, label


def custom_multi_cropping(rng, image, label, global_size, local_size,
                          n_global: int = 2, n_local: int = 4):
    """dataset.py:512-577 (multi-crop, unused by reference trainers):
    n_global random crops at global_size + n_local at local_size."""
    crops: List[Tuple[np.ndarray, np.ndarray]] = []
    for _ in range(n_global):
        crops.append(random_crop(rng, image, label, global_size))
    for _ in range(n_local):
        crops.append(random_crop(rng, image, label, local_size))
    return crops
