"""Coverage for misc utilities, 2D host transforms, and profiling helpers."""

import jax.numpy as jnp
import numpy as np

from arco_tpu.data import transforms2d
from arco_tpu.utils import misc
from arco_tpu.utils.profiling import measure_fp_time


class TestMisc:
    def test_average_meter(self):
        m = misc.AverageMeter()
        m.update(1.0)
        m.update(3.0)
        assert m.avg == 2.0 and m.count == 2

    def test_unif_label_sampler(self):
        lists = [[0, 1, 2], [3, 4], [5]]
        s = misc.UnifLabelSampler(6, lists)
        idx = s.indexes()
        assert len(idx) == 6
        assert set(idx) <= set(range(6))

    def test_lr_decay(self):
        assert misc.learning_rate_decay(0.1, 0) == 0.1
        assert misc.learning_rate_decay(0.1, 10000) < 0.1

    def test_iou_dice(self):
        pred = np.array([[0, 1], [1, 1]])
        gt = np.array([[0, 1], [1, 0]])
        ious = misc.get_iou(pred, gt, 2)
        np.testing.assert_allclose(ious[1], 2 / 3)
        dices = misc.get_dice(pred, gt, 2)
        np.testing.assert_allclose(dices[1], 4 / 5)

    def test_post_processing(self):
        seg = np.zeros((10, 10), np.uint8)
        seg[1:4, 1:4] = 1
        seg[8, 8] = 1
        seg[5:7, 5:7] = 2
        out = misc.post_processing(seg)
        assert out[2, 2] == 1 and out[8, 8] == 0 and out[5, 5] == 2


class TestTransforms2D:
    def test_center_crop(self, rng):
        img = rng.rand(40, 40).astype(np.float32)
        lab = rng.randint(0, 3, (40, 40))
        i, l = transforms2d.center_crop(img, lab, (24, 24))
        assert i.shape == (24, 24) and l.shape == (24, 24)

    def test_random_crop_pads_small(self, rng):
        img = rng.rand(10, 10).astype(np.float32)
        lab = rng.randint(0, 2, (10, 10))
        i, l = transforms2d.random_crop(rng, img, lab, (16, 16))
        assert i.shape == (16, 16)

    def test_brightness_clamps(self, rng):
        img = rng.rand(8, 8).astype(np.float32)
        out = transforms2d.brightness_transform(rng, img)
        assert out.min() >= 0 and out.max() <= 1

    def test_onehot(self):
        lab = np.array([[0, 1], [2, 1]])
        oh = transforms2d.create_onehot_label(lab, 3)
        assert oh.shape == (3, 2, 2)
        np.testing.assert_allclose(oh.sum(0), 1)

    def test_multi_crop(self, rng):
        img = rng.rand(32, 32).astype(np.float32)
        lab = rng.randint(0, 2, (32, 32))
        crops, params = transforms2d.custom_multi_cropping(
            rng, img, lab, size_large=(24, 24), size_small=(12, 12))
        assert len(crops) == 6 and len(params) == 6
        assert crops[0][0].shape == (24, 24)
        assert crops[-1][0].shape == (12, 12)
        # small crops are conditioned on the LAST large crop (the MoCo key):
        # each must intersect it by >=10% of its own area unless the
        # fallback fired; the fallback is rare at these scales, so require
        # at least one conditioned small crop to genuinely overlap.
        key_box = params[1]
        overlaps = [transforms2d._box_intersection(p, key_box)
                    for p in params[2:]]
        assert any(o > 0 for o in overlaps)

    def test_multi_crop_unconditioned_and_imageonly(self, rng):
        img = rng.rand(32, 32).astype(np.float32)
        crops, params = transforms2d.custom_multi_cropping(
            rng, img, None, size_large=24, size_small=12, n_large=1,
            n_small=2, condition_small_crops_on_key=False)
        assert len(crops) == 3
        assert crops[0].shape == (24, 24) and crops[-1].shape == (12, 12)
        for i, j, h, w in params:
            assert 0 <= i and 0 <= j and i + h <= 32 and j + w <= 32


class TestProfiling:
    def test_measure_fp_time(self):
        t = measure_fp_time(lambda x: (x * 2).sum(), jnp.ones((64, 64)),
                            n=3, warmup=1)
        assert t > 0


class TestProvenance:
    def test_log_provenance_returns_identity(self, caplog):
        """Provenance substitutes the reference's code self-copy
        (train_arco_2d.py:514-517): a git hash (possibly -dirty) or an
        explicit 'unknown', logged and returned."""
        import logging
        from arco_tpu.utils.logging import log_provenance
        with caplog.at_level(logging.INFO):
            ident = log_provenance()
        assert ident == "unknown" or len(ident.split("-")[0]) == 40
        assert any("code provenance" in r.message for r in caplog.records)
