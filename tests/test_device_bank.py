"""DeviceVolumeBank: on-device rot90/flip/crop must be bit-identical to the
host pipeline (datasets.random_rot_flip_3d + random_crop_3d) for the same
RandomState sequence — the staging path that eliminates the per-step
host->device volume transfers (and the tunnel client's host-buffer leak)."""

import numpy as np
import pytest

from arco_tpu.data.datasets import LAHeartDataset
from arco_tpu.data.device_bank import DeviceVolumeBank
from arco_tpu.data.synthetic import make_la_like

PATCH = (32, 32, 16)


@pytest.fixture(scope="module")
def la_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("la")
    make_la_like(str(root / "d"), n_train=5, size=(48, 48, 32), seed=0)
    return str(root / "d")


def test_gather_matches_host_pipeline(la_root):
    ds = LAHeartDataset(la_root, "train", patch_size=PATCH)
    bank = DeviceVolumeBank.from_dataset(ds, PATCH)

    rng_host = np.random.RandomState(11)
    rng_dev = np.random.RandomState(11)
    idxs = [0, 3, 1, 4, 2, 0, 0, 3]

    want_img = np.stack([ds.get(i, rng_host)["image"] for i in idxs])
    # rebuild rng_host state consumption: get() draws label path too — the
    # same call produced both, so re-draw for labels with a fresh twin
    rng_host2 = np.random.RandomState(11)
    want_lab = np.stack([ds.get(i, rng_host2)["label"] for i in idxs])

    params = bank.draw_params(rng_dev, idxs)
    got_img, got_lab = bank.gather(params)
    np.testing.assert_array_equal(np.asarray(got_img), want_img)
    np.testing.assert_array_equal(np.asarray(got_lab), want_lab)
    # identical rng consumption: the streams must end in the same state
    assert rng_host.randint(0, 1 << 30) == rng_dev.randint(0, 1 << 30)


def test_pad_rule_applied(la_root):
    """Volumes smaller than the patch get the host's symmetric pad."""
    ds = LAHeartDataset(la_root, "train", patch_size=(48, 48, 34))
    bank = DeviceVolumeBank.from_dataset(ds, (48, 48, 34))
    # 32 <= 34 triggers pd = (34-32)//2+3 = 4 on depth; w/h pad too
    # (condition is a single `or`, la_heart.py:113-147 semantics)
    assert bank.shape[2] == 32 + 2 * 4
    rng = np.random.RandomState(0)
    img, lab = bank.gather(bank.draw_params(rng, [0, 1]))
    assert img.shape == (2, 48, 48, 34, 1)
    assert lab.shape == (2, 48, 48, 34)


def test_non_square_rejected():
    imgs = np.zeros((2, 16, 20, 8), np.float32)
    labs = np.zeros((2, 16, 20, 8), np.int8)
    with pytest.raises(ValueError, match="square"):
        DeviceVolumeBank(imgs, labs, (8, 8, 4))


def test_non_uniform_rejected(la_root, tmp_path):
    class Mixed:
        def __len__(self):
            return 2

        def load(self, i):
            s = 48 if i == 0 else 44
            return (np.zeros((s, s, 32), np.float32),
                    np.zeros((s, s, 32), np.uint8))

    with pytest.raises(ValueError, match="uniform"):
        DeviceVolumeBank.from_dataset(Mixed(), PATCH)


class TestDeviceSliceBank:
    """2D analog: device gather must be bit-identical to
    SliceDataset.get (zoom at staging + rot90/flip or scipy-exact nearest
    rotation on device)."""

    @pytest.fixture(scope="class")
    def acdc_root(self, tmp_path_factory):
        from arco_tpu.data.synthetic import make_acdc_like
        root = tmp_path_factory.mktemp("acdc2")
        make_acdc_like(str(root / "d"), n_train=12, n_val=1, size=(40, 40),
                       num_classes=3, depth=4, seed=0)
        return str(root / "d")

    def test_rotate_maps_match_scipy(self):
        from scipy import ndimage
        from arco_tpu.data.device_bank import ROT_ANGLES, _rotate_maps
        rng = np.random.RandomState(0)
        for shape in ((9, 9), (16, 16), (33, 33)):
            x = rng.randint(0, 100, shape).astype(np.float32)
            i0, j0, ok = _rotate_maps(*shape)
            for ai, ang in enumerate(ROT_ANGLES):
                want = ndimage.rotate(x, int(ang), order=0, reshape=False)
                got = np.where(ok[ai], x[i0[ai], j0[ai]], 0.0)
                np.testing.assert_array_equal(got, want, err_msg=str(ang))

    def test_gather_matches_host_dataset(self, acdc_root):
        from arco_tpu.data.datasets import SliceDataset
        from arco_tpu.data.device_bank import DeviceSliceBank

        ds = SliceDataset(acdc_root, "train", output_size=(32, 32))
        bank = DeviceSliceBank.from_dataset(ds)
        rng_h = np.random.RandomState(5)
        rng_h2 = np.random.RandomState(5)
        rng_d = np.random.RandomState(5)
        # enough samples to hit all three modes (identity/rotflip/rotate)
        idxs = list(range(12)) * 3
        want_img = np.stack([ds.get(i, rng_h)["image"] for i in idxs])
        want_lab = np.stack([ds.get(i, rng_h2)["label"] for i in idxs])
        params = bank.draw_params(rng_d, idxs)
        assert set(params[:, 1].tolist()) == {0, 1, 2}
        got_img, got_lab = bank.gather(params)
        np.testing.assert_array_equal(np.asarray(got_img), want_img)
        np.testing.assert_array_equal(np.asarray(got_lab), want_lab)
        assert rng_h.randint(1 << 30) == rng_d.randint(1 << 30)


def test_two_stream_device_batches_matches_host_pipeline(la_root):
    """The trainer-facing generator must yield batches bit-identical to
    TwoStreamPipeline's single-worker stream (same seed), so flipping
    data.device_data cannot change training semantics."""
    from arco_tpu.data.device_bank import two_stream_device_batches
    from arco_tpu.data.pipeline import TwoStreamPipeline

    ds_l = LAHeartDataset(la_root, "train", index=2, label_type=1,
                          patch_size=PATCH)
    ds_u = LAHeartDataset(la_root, "train", index=2, label_type=0,
                          patch_size=PATCH)
    bank_l = DeviceVolumeBank.from_dataset(ds_l, PATCH)
    bank_u = DeviceVolumeBank.from_dataset(ds_u, PATCH)

    pipe = TwoStreamPipeline(ds_l, ds_u, 3, seed=9, labeled_bs=1, workers=1)
    gen = two_stream_device_batches(bank_l, bank_u, 1, 2, seed=9,
                                    n_l=len(ds_l), n_u=len(ds_u))
    try:
        for _ in range(4):
            want = next(iter(pipe))
            got = next(gen)
            np.testing.assert_array_equal(np.asarray(got["image_l"]),
                                          want["image_l"])
            np.testing.assert_array_equal(np.asarray(got["label_l"]),
                                          want["label_l"])
            np.testing.assert_array_equal(np.asarray(got["image_u"]),
                                          want["image_u"])
    finally:
        pipe.close()
