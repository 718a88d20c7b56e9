"""SynapseDataset (npz slices / h5 volumes, LiTS `_40` lists) and
BraTS2019Dataset fixtures — upgrades PARITY §2.5 rows from smoke to tested
(reference: build_dataset.py:127-199, dataset_withAug.py:22-80)."""

import os

import h5py
import numpy as np
import pytest

from arco_tpu.data.datasets import BraTS2019Dataset, SynapseDataset


@pytest.fixture
def synapse_root(tmp_path):
    root = tmp_path / "synapse"
    lists = tmp_path / "lists"
    root.mkdir()
    lists.mkdir()
    rng = np.random.RandomState(0)
    train_cases = [f"case{i:04d}_slice{j:03d}" for i in range(3)
                   for j in range(2)]
    for c in train_cases:
        np.savez(root / f"{c}.npz",
                 image=rng.rand(64, 64).astype(np.float32),
                 label=rng.randint(0, 9, (64, 64)).astype(np.int64))
    (lists / "train.txt").write_text("\n".join(train_cases) + "\n")
    (lists / "train_40.txt").write_text("\n".join(train_cases[:4]) + "\n")
    vol_cases = ["case0008"]
    for c in vol_cases:
        with h5py.File(root / f"{c}.npy.h5", "w") as f:
            f["image"] = rng.rand(5, 64, 64).astype(np.float32)
            f["label"] = rng.randint(0, 9, (5, 64, 64)).astype(np.int64)
    (lists / "test_vol.txt").write_text("\n".join(vol_cases) + "\n")
    return str(root), str(lists)


class TestSynapseDataset:
    def test_train_npz_slices(self, synapse_root):
        root, lists = synapse_root
        ds = SynapseDataset(root, lists, split="train", transform=False,
                            output_size=(64, 64))
        assert len(ds.sample_list) == 6
        img, lab = ds.load(0)
        assert img.shape == (64, 64) and lab.shape == (64, 64)

    def test_lits_40_suffix(self, synapse_root):
        root, lists = synapse_root
        ds = SynapseDataset(root, lists, split="train", lits=True,
                            transform=False)
        # LiTS uses the `_40` list variant (build_dataset.py:131-134)
        assert len(ds.sample_list) == 4

    def test_labeled_unlabeled_index_split(self, synapse_root):
        root, lists = synapse_root
        lab = SynapseDataset(root, lists, split="train", index=2,
                             label_type=1, transform=False)
        unlab = SynapseDataset(root, lists, split="train", index=2,
                               label_type=0, transform=False)
        assert len(lab.sample_list) == 2
        assert len(unlab.sample_list) == 4
        assert set(lab.sample_list).isdisjoint(unlab.sample_list)

    def test_vol_h5(self, synapse_root):
        root, lists = synapse_root
        ds = SynapseDataset(root, lists, split="test_vol", transform=False)
        img, lab = ds.load(0)
        assert img.shape == (5, 64, 64)
        assert lab.shape == (5, 64, 64)


class TestBraTS2019:
    @pytest.fixture
    def brats_root(self, tmp_path):
        (tmp_path / "data").mkdir()
        rng = np.random.RandomState(1)
        cases = [f"BraTS19_{i}" for i in range(3)]
        for c in cases:
            with h5py.File(tmp_path / "data" / f"{c}.h5", "w") as f:
                f["image"] = rng.rand(32, 32, 32).astype(np.float32)
                f["label"] = (rng.rand(32, 32, 32) > 0.8).astype(np.uint8)
        (tmp_path / "train.txt").write_text("\n".join(cases) + "\n")
        (tmp_path / "val.txt").write_text(cases[0] + "\n")
        return str(tmp_path)

    def test_train_list_and_load(self, brats_root):
        ds = BraTS2019Dataset(brats_root, split="train",
                              patch_size=(16, 16, 16))
        assert len(ds.sample_list) == 3
        img, lab = ds.load(0)
        assert img.shape == (32, 32, 32)

    def test_num_cap_and_val(self, brats_root):
        ds = BraTS2019Dataset(brats_root, split="train", num=2)
        assert len(ds.sample_list) == 2
        val = BraTS2019Dataset(brats_root, split="val")
        assert len(val.sample_list) == 1

    def test_get_crops_to_patch(self, brats_root):
        ds = BraTS2019Dataset(brats_root, split="train",
                              patch_size=(16, 16, 16))
        rng = np.random.RandomState(0)
        sample = ds.get(0, rng)
        assert sample["image"].shape == (16, 16, 16, 1)
        assert sample["label"].shape == (16, 16, 16)
