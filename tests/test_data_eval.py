"""Data layer + evaluation tests on synthetic ACDC/LA-shaped datasets."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arco_tpu.data.datasets import LAHeartDataset, SliceDataset
from arco_tpu.data.samplers import TwoStreamBatchSampler
from arco_tpu.data.synthetic import make_acdc_like, make_la_like
from arco_tpu.eval.slice2d import test_single_volume_2d as eval_volume_2d
from arco_tpu.eval.sliding_window import largest_connected_component
from arco_tpu.eval.sliding_window import test_single_case_3d as eval_case_3d
from arco_tpu.utils.metrics import calculate_metric_percase


@pytest.fixture(scope="module")
def acdc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("acdc")
    return make_acdc_like(str(root), n_train=12, n_val=1, size=(32, 32))


@pytest.fixture(scope="module")
def la_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("la")
    return make_la_like(str(root), n_train=4, size=(32, 32, 24))


class TestSliceDataset:
    def test_labeled_unlabeled_split(self, acdc_root):
        ds_l = SliceDataset(acdc_root, "train", index=4, label_type=1)
        ds_u = SliceDataset(acdc_root, "train", index=4, label_type=0)
        assert len(ds_l) == 4 and len(ds_u) == 8
        assert set(ds_l.sample_list).isdisjoint(ds_u.sample_list)

    def test_get_applies_transform(self, acdc_root):
        ds = SliceDataset(acdc_root, "train", output_size=(48, 48))
        s = ds.get(0, np.random.RandomState(0))
        assert s["image"].shape == (48, 48, 1)
        assert s["label"].shape == (48, 48)
        assert s["image"].dtype == np.float32


class TestLADataset:
    def test_crop_to_patch(self, la_root):
        ds = LAHeartDataset(la_root, "train", patch_size=(16, 16, 12))
        s = ds.get(0, np.random.RandomState(0))
        assert s["image"].shape == (16, 16, 12, 1)


class TestTwoStream:
    def test_batch_composition(self):
        s = TwoStreamBatchSampler(list(range(10)), list(range(10, 100)), 4, 2)
        batches = list(s)
        assert len(batches) == 5  # 10 primary / 2 per batch
        for b in batches:
            assert len(b) == 4
            assert all(i < 10 for i in b[:2])
            assert all(i >= 10 for i in b[2:])
        # primary indices each appear exactly once per epoch
        prim = sorted(i for b in batches for i in b[:2])
        assert prim == list(range(10))


class TestMetrics:
    def test_perfect_prediction(self):
        mask = np.zeros((8, 8, 8), bool)
        mask[2:6, 2:6, 2:6] = True
        d, j, h, a = calculate_metric_percase(mask, mask)
        assert d == 1.0 and j == 1.0 and h == 0.0 and a == 0.0

    def test_known_offset(self):
        a = np.zeros((16, 16), bool)
        b = np.zeros((16, 16), bool)
        a[4:8, 4:8] = True
        b[5:9, 4:8] = True   # shifted by 1 pixel
        d, j, h95, asd_v = calculate_metric_percase(a, b)
        assert 0.5 < d < 1.0
        assert h95 >= 1.0
        assert asd_v > 0

    def test_medpy_reference_values(self):
        """Golden check vs medpy semantics on an analytic case."""
        a = np.zeros((10, 10), bool)
        b = np.zeros((10, 10), bool)
        a[2:5, 2:5] = True
        b[2:5, 2:5] = True
        b[5, 2] = True  # one extra pixel adjacent to the block
        d, j, h95, asd_v = calculate_metric_percase(a, b)
        np.testing.assert_allclose(d, 2 * 9 / (9 + 10))
        np.testing.assert_allclose(j, 9 / 10)


class TestEval2D:
    def test_single_volume_pipeline(self, acdc_root):
        ds = SliceDataset(acdc_root, "val", list_name="val.list")
        image, label = ds.load(0)

        def predict(x):  # "oracle": recover label from image intensity
            val = jnp.clip(jnp.round(x[..., 0] * 3), 0, 3)
            return val.astype(jnp.int32)

        metrics, pred = eval_volume_2d(image, label, predict, 4,
                                       input_size=(32, 32))
        assert pred.shape == label.shape
        assert len(metrics) == 3
        dice = np.mean([m[0] for m in metrics])
        assert dice > 0.5  # oracle should be accurate up to noise


class TestEval3D:
    def test_sliding_window_covers_volume(self, la_root):
        ds = LAHeartDataset(la_root, "test")
        image, label = ds.load(0)

        def predict(x):  # threshold oracle
            fg = (x[..., 0] > 0.5).astype(jnp.float32)
            return jnp.stack([1 - fg, fg], axis=-1)

        pred, score = eval_case_3d(predict, image, stride_xy=8, stride_z=6,
                                   patch_size=(16, 16, 12), num_classes=2)
        assert pred.shape == image.shape
        assert np.isfinite(score).all()
        d, _, _, _ = calculate_metric_percase(pred == 1, label == 1)
        assert d > 0.5

    def test_largest_cc(self):
        seg = np.zeros((10, 10), np.uint8)
        seg[1:5, 1:5] = 1
        seg[8, 8] = 1
        out = largest_connected_component(seg)
        assert out[2, 2] == 1 and out[8, 8] == 0
