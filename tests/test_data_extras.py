"""Tests for the natural-image branch, preprocessing recipes, packed cache,
and volume IO."""

import numpy as np
import pytest

from arco_tpu.data import natural, preprocessing
from arco_tpu.data.cache import CachedSliceDataset
from arco_tpu.data.synthetic import make_acdc_like
from arco_tpu.data.datasets import SliceDataset
from arco_tpu.utils.volume_io import load_volume, save_volume


class TestCityscapesMap:
    def test_train_ids(self):
        mask = np.array([[7, 8, 26], [0, 33, 19]])
        out = natural.cityscapes_class_map(mask)
        np.testing.assert_array_equal(out, [[0, 1, 13], [255, 18, 6]])


class TestClassBalancedIdx:
    def test_every_class_covered(self):
        rng = np.random.RandomState(0)
        masks = {i: rng.randint(0, 4, size=(8, 8)) for i in range(40)}
        labeled, unlabeled = natural.class_balanced_idx(
            lambda i: masks[i], range(40), num_classes=4, label_num=3)
        assert len(labeled) + len(unlabeled) == 40
        counts = np.zeros(4)
        for i in labeled:
            for c in np.unique(masks[i]):
                counts[c] += 1
        assert (counts >= 3).all()


class TestGeometricTransform:
    def test_crop_and_pad(self):
        rng = np.random.RandomState(0)
        img = rng.rand(40, 60, 3).astype(np.float32)
        lab = rng.randint(0, 3, size=(40, 60))
        out_img, out_lab = natural.geometric_transform(
            rng, img, lab, crop_size=(48, 48), scale_size=(1.0, 1.0))
        assert out_img.shape == (48, 48, 3)
        assert out_lab.shape == (48, 48)
        assert set(np.unique(out_lab)) <= {0, 1, 2, 255}


class TestColormaps:
    def test_pascal_colormap_shape(self):
        cm = natural.create_pascal_label_colormap()
        assert cm.shape == (256, 3)
        assert (cm[0] == 0).all()

    def test_cityscapes_colormap(self):
        cm = natural.create_cityscapes_label_colormap()
        assert cm.shape == (19, 3)


class TestPreprocessing:
    def test_ct_window(self):
        vol = np.array([-1000.0, 50.0, 3000.0])
        out = preprocessing.ct_window_normalize(vol, wl=50, ww=400)
        np.testing.assert_allclose(out, [0.0, 0.5, 1.0])

    def test_mri_percentile(self):
        rng = np.random.RandomState(0)
        vol = rng.randn(16, 16, 8)
        out = preprocessing.mri_percentile_clip(vol)
        assert abs(out.mean()) < 1e-5
        assert abs(out.std() - 1.0) < 1e-3

    def test_partial_label_mask_fraction(self):
        rng = np.random.RandomState(0)
        lab = np.zeros((32, 32), np.int32)
        lab[8:24, 8:24] = 1
        out = preprocessing.partial_label_mask(lab, fraction=0.2,
                                               void_classes=(0, 255),
                                               rng=rng)
        region = (out == 1).sum()
        total = (lab == 1).sum()
        assert 0.15 * total <= region <= 0.6 * total
        # grown region must be connected & inside the class region
        assert ((out == 1) & (lab != 1)).sum() == 0


class TestPackedCache:
    def test_cache_matches_source(self, tmp_path):
        root = make_acdc_like(str(tmp_path / "d"), n_train=6, n_val=1,
                              size=(24, 24))
        ds = SliceDataset(root, "train", output_size=(24, 24))
        cached = CachedSliceDataset(ds, str(tmp_path / "cache"))
        for i in range(len(ds)):
            a_img, a_lab = ds.load(i)
            b_img, b_lab = cached.load(i)
            np.testing.assert_allclose(a_img, b_img)
            np.testing.assert_array_equal(a_lab, b_lab)

    def test_cache_reused(self, tmp_path):
        root = make_acdc_like(str(tmp_path / "d2"), n_train=4, n_val=1,
                              size=(16, 16))
        ds = SliceDataset(root, "train", output_size=(16, 16))
        c1 = CachedSliceDataset(ds, str(tmp_path / "c2"))
        c2 = CachedSliceDataset(ds, str(tmp_path / "c2"))
        np.testing.assert_allclose(c1.load(0)[0], c2.load(0)[0])


class TestVolumeIO:
    def test_roundtrip(self, tmp_path):
        vol = np.random.RandomState(0).rand(4, 8, 8).astype(np.float32)
        base = str(tmp_path / "case_pred")
        save_volume(base, vol)
        import os
        path = base + (".nii.gz" if os.path.exists(base + ".nii.gz")
                       else ".npz")
        out = load_volume(path) if path.endswith(".npz") else None
        if out is not None:
            np.testing.assert_allclose(out, vol)
