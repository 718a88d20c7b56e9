"""Offline preprocessing CLIs (VERDICT r3 item 8): the dilation-grown
partial-label regime (pascal_preprocessing.py:36-75,
cityscapes_preprocessing.py:77-126) and the directory trees both scripts
produce."""

import os

import numpy as np
import pytest

from arco_tpu.data import preprocessing

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _two_blob_label():
    """Class 1 is DISCONNECTED (two blobs 8 px apart): the reference's
    growth front dilates the UNGATED mask, so it crosses the gap —
    a gated-dilation implementation would stall at the first blob."""
    lab = np.zeros((64, 64), np.uint8)
    lab[4:20, 4:20] = 1
    lab[4:20, 28:44] = 1
    lab[40:60, 40:60] = 2
    lab[0, 63] = 255  # void
    return lab


class TestPartialRegime:
    def test_reaches_fraction_and_stays_gated(self):
        lab = _two_blob_label()
        rng = np.random.RandomState(0)
        out = preprocessing.partial_label_mask(
            lab, 0.25, void_classes=(0, 255), fill_value=255, rng=rng)
        for cls in (1, 2):
            region = lab == cls
            got = out == cls
            assert got.sum() >= int(0.25 * region.sum())
            assert not (got & ~region).any(), "partial mask leaked"
        # unlabeled + original void both carry the fill value
        assert out[0, 63] == 255
        assert (out == 255).sum() > 0

    def test_front_crosses_disconnected_gap(self):
        lab = _two_blob_label()
        # demand more pixels than one blob holds: only the ungated 5x5
        # front can reach the second blob
        one_blob = 16 * 16
        out = preprocessing.partial_label_mask(
            lab, 0.8, void_classes=(0, 255), fill_value=255, rng=np.random.RandomState(1))
        assert (out == 1).sum() >= int(0.8 * 2 * one_blob) > one_blob

    def test_p0_is_one_pixel_per_class(self):
        lab = _two_blob_label()
        out = preprocessing.partial_label_mask(
            lab, 0.0, void_classes=(0, 255), fill_value=255,
            rng=np.random.RandomState(0))
        assert (out == 1).sum() == 1
        assert (out == 2).sum() == 1
        assert ((out == 1) & (lab != 1)).sum() == 0


class TestPascalCLI:
    def test_tree_and_regimes(self, tmp_path):
        from arco_tpu.cli import preprocess_pascal as pp

        root = str(tmp_path / "SegmentationClassAug")
        os.makedirs(root)
        rng = np.random.RandomState(0)
        for i in range(3):
            lab = np.full((48, 48), 255, np.uint8)
            lab[8:40, 8:40] = 0  # background is a VALID pascal class
            lab[16:32, 16:32] = rng.randint(1, 21)
            Image.fromarray(lab).save(os.path.join(root, f"img_{i}.png"))

        pp.process(root, seeds=[0], percents=[25, 5], progress=lambda *_: None)

        for p in ("p25_0", "p5_0", "p0_0"):
            d = f"{root}_{p}"
            assert os.path.isdir(d), d
            assert len(os.listdir(d)) == 3
        lab0 = np.array(Image.open(os.path.join(root, "img_0.png")))
        out25 = np.array(Image.open(f"{root}_p25_0/img_0.png"))
        out0 = np.array(Image.open(f"{root}_p0_0/img_0.png"))
        for cls in [c for c in np.unique(lab0) if c != 255]:
            region = (lab0 == cls).sum()
            assert (out25 == cls).sum() >= int(0.25 * region)
            assert ((out25 == cls) & (lab0 != cls)).sum() == 0
            assert (out0 == cls).sum() == 1

    def test_parser_dry_run(self):
        from arco_tpu.cli import preprocess_pascal as pp
        args = pp.build_parser().parse_args(
            ["--label-root", "/x", "--seeds", "0", "--percents", "25"])
        assert args.with_p0 and args.seeds == [0]


class TestCityscapesCLI:
    def test_flatten_and_partial(self, tmp_path):
        from arco_tpu.cli import preprocess_cityscapes as pc

        root = str(tmp_path / "cs")
        rng = np.random.RandomState(0)
        for split in ("train", "val"):
            for city in ("aachen", "bochum"):
                imd = os.path.join(root, "leftImg8bit", split, city)
                gtd = os.path.join(root, "gtFine", split, city)
                os.makedirs(imd), os.makedirs(gtd)
                img = rng.randint(0, 255, (32, 64, 3), np.uint8)
                lab = np.zeros((32, 64), np.uint8)
                lab[8:24, 16:48] = 7  # road — a valid class
                lab[0:4] = 0          # void
                Image.fromarray(img).save(
                    os.path.join(imd, f"{city}_000000_leftImg8bit.png"))
                Image.fromarray(lab).save(
                    os.path.join(gtd, f"{city}_000000_gtFine_labelIds.png"))

        pc.flatten(root, progress=lambda *_: None)
        for split in ("train", "val"):
            ims = os.listdir(os.path.join(root, "images", split))
            labs = os.listdir(os.path.join(root, "labels", split))
            assert sorted(ims) == sorted(labs) == ["0.png", "1.png"]
        im0 = Image.open(os.path.join(root, "images", "train", "0.png"))
        assert im0.size == (1024, 512)

        pc.partial(root, seeds=[0], percents=[25], progress=lambda *_: None)
        d = os.path.join(root, "labels", "train_p25_0")
        assert sorted(os.listdir(d)) == ["0.png", "1.png"]
        full = np.array(Image.open(
            os.path.join(root, "labels", "train", "0.png")))
        part = np.array(Image.open(os.path.join(d, "0.png")))
        region = (full == 7).sum()
        assert (part == 7).sum() >= int(0.25 * region)
        # cityscapes fills unlabeled with 0, not 255
        assert ((part != 7) == (part == 0)).all()
