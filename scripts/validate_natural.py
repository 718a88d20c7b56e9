"""Natural-image (Pascal-layout) method-quality gate (VERDICT r3 item 5):
drive the REAL natural-branch CLIs — cli.train_arco_natural +
cli.eval_natural — over a synthetic Pascal-shaped fixture on a task where
supervised-only at the label budget demonstrably underperforms, and compare
held-out mIoU of the full-ARCO arm against a supervised-only arm at the
SAME step budget.

Task mechanism (the 2D 'shifted' gate transplanted to RGB, see
scripts/validate_semi_synthetic.py make_task_shifted): class identity is
carried by intensity level, and every train image gets a random per-image
gain/offset appearance shift while the VAL set uses a disjoint (wider)
shift range. With only --label_num labeled images the supervised arm sees a
handful of appearance variants and cannot generalize; the ARCO arm sees the
shift distribution through the unlabeled stream (pseudo-label cutmix
consistency + photometric-invariance machinery) at zero extra labels.

Both arms run through cli.train_arco_natural verbatim — the supervised arm
only zeroes the method's loss weights via the CLI's own --set hook
(k1=k3=k4=0, eqv off), so any future wiring regression in the natural
trainer breaks this gate too.

    python scripts/validate_natural.py --seeds 0 1 2 \
        --out docs/artifacts/quality_gate
"""

import argparse
import contextlib
import io
import json
import os
import shutil
import sys
import tempfile

import numpy as np
from PIL import Image

HW = 64
K_CLS = 4
N_TRAIN, N_VAL = 40, 8
LABEL_NUM = 2
ITERS = 600
MECHANISM = "shifted"
MODEL = "unet"


def _striped_rgb(rng, theta_deg):
    """Orientation-coded texture classes (the 2D 'striped' gate's
    mechanism — its committed 2D run gains +0.19..0.26/seed): both
    foreground classes share the background's mean intensity; classes
    differ by stripe FREQUENCY, every image draws one orientation. Two
    theta=0 labeled images can't teach orientation invariance; the ARCO
    recipe's TPS-eqv warp rotates +-60 deg and chains it outward."""
    label = np.zeros((HW, HW), np.uint8)
    yy, xx = np.mgrid[0:HW, 0:HW]
    for c in range(1, K_CLS):
        cy, cx = rng.randint(HW // 4, 3 * HW // 4, 2)
        r = rng.randint(HW // 8, HW // 4)
        label[(yy - cy) ** 2 + (xx - cx) ** 2 < r * r] = c
    th = theta_deg * np.pi / 180.0
    px = (xx * np.cos(th) + yy * np.sin(th))
    periods = {1: 14.0, 2: 7.0, 3: 3.5}
    img = np.full((HW, HW), 0.5, np.float32)
    for c, period in periods.items():
        tex = 0.5 + 0.3 * np.sin(2 * np.pi * px / period)
        img = np.where(label == c, tex, img)
    img = np.clip(img + 0.08 * rng.randn(HW, HW), 0.0, 1.0)
    rgb = np.stack([img] * 3, axis=-1)
    rgb = rgb + 0.02 * rng.randn(HW, HW, 3).astype(np.float32)
    return (np.clip(rgb, 0, 1) * 255).astype(np.uint8), label


def _shifted_rgb(rng, gain, offset):
    """One image/label pair: intensity-coded class blobs + per-image
    appearance shift (gain/offset), RGB uint8."""
    label = np.zeros((HW, HW), np.uint8)
    yy, xx = np.mgrid[0:HW, 0:HW]
    for c in range(1, K_CLS):
        cy, cx = rng.randint(HW // 4, 3 * HW // 4, 2)
        r = rng.randint(HW // 10, HW // 5)
        label[(yy - cy) ** 2 + (xx - cx) ** 2 < r * r] = c
    # AFFINE level code (the 2D gate's structure): gain maps a lower
    # class's level onto a higher class's CANONICAL level at finite gain
    # (0.36->0.52 at g~1.44, 0.52->0.68 at g~1.31), so canon-threshold
    # classifiers fail at high gain — while a proportional 0..scale code
    # never crosses. Top level 0.68 keeps gain 1.45 unclipped (0.99).
    levels = np.array([0.2, 0.36, 0.52, 0.68], np.float32)
    base = levels[label]
    img = gain * base + offset + 0.05 * rng.randn(HW, HW).astype(np.float32)
    img = np.clip(img, 0, 1)
    rgb = np.stack([img] * 3, axis=-1)
    rgb = rgb + 0.02 * rng.randn(HW, HW, 3).astype(np.float32)
    return (np.clip(rgb, 0, 1) * 255).astype(np.uint8), label


def make_fixture(root, seed):
    """Pascal directory layout (JPEGImages/SegmentationClassAug/ImageSets).

    Appearance regime calibrated like the committed 2D 'shifted' gate
    (quality_gate/README.md cal1-cal4): one-sided brighter-only gains so
    SNR never drops below canon (dimmer-side shift is ill-posed — class
    levels collapse into each other and BOTH arms fail), and VAL drawn
    from the SAME distribution the unlabeled stream spans — a val band
    disjoint from the unlabeled support cannot be bridged by any
    semi-supervised mechanism (the first committed run's -0.138 design
    flaw #2). The first LABEL_NUM train images are written at canonical
    appearance as a BEST-EFFORT pin only: the trainer's
    class_balanced_idx draws the labeled picks from a seeded permutation
    (data/natural.py), so the actual labeled images are usually two
    RANDOM-appearance samples — still far too few to span the
    orientation/appearance range, which is what the gate's validity
    actually rests on (and what the measured +0.19 striped gap shows)."""
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "JPEGImages"))
    os.makedirs(os.path.join(root, "SegmentationClassAug"))
    sets = os.path.join(root, "ImageSets", "Segmentation")
    os.makedirs(sets)
    names = {"train": [f"tr_{i:03d}" for i in range(N_TRAIN)],
             "val": [f"va_{i:03d}" for i in range(N_VAL)]}
    for split, ns in names.items():
        with open(os.path.join(sets, f"{split}.txt"), "w") as f:
            f.write("\n".join(ns) + "\n")
        for i, n in enumerate(ns):
            if MECHANISM == "striped":
                if split == "train" and i < LABEL_NUM:
                    theta = 0.0                 # canonical labeled picks
                elif split == "train":
                    theta = rng.uniform(0.0, 90.0)
                else:
                    theta = np.linspace(0.0, 90.0, N_VAL)[i]
                img, lab = _striped_rgb(rng, theta)
                Image.fromarray(img).save(
                    os.path.join(root, "JPEGImages", f"{n}.jpg"),
                    quality=95)
                Image.fromarray(lab).save(
                    os.path.join(root, "SegmentationClassAug", f"{n}.png"))
                continue
            if split == "train" and i < LABEL_NUM:
                gain, offset = 1.0, 0.0          # canonical labeled picks
            elif split == "train":
                gain = rng.uniform(1.0, 1.45)
                offset = rng.uniform(-0.08, 0.08)
            else:
                gain = np.linspace(1.0, 1.45, N_VAL)[i]
                offset = rng.uniform(-0.08, 0.08)
            # labels must be PNG (palette-free grayscale), images JPEG —
            # save losslessly enough for a 4-class intensity code
            img, lab = _shifted_rgb(rng, gain, offset)
            Image.fromarray(img).save(
                os.path.join(root, "JPEGImages", f"{n}.jpg"), quality=95)
            Image.fromarray(lab).save(
                os.path.join(root, "SegmentationClassAug", f"{n}.png"))
    return root


SMALL = ["--set", "memobank_size=512", "--set", "memobank_size_bg=512",
         "--set", "num_queries=32", "--set", "num_negatives=64",
         "--set", "K=8", "--set", "memobank_enqueue=64"]
SUP_OFF = ["--set", "k1=0", "--set", "k3=0", "--set", "k4=0",
           "--set", "use_eqv_loss=false", "--set", "compute_eqv=false"]


WARM_ITERS = 300


def run_arm(root, snap, arm, seed, warm_snapshot=None):
    """arm='warm' runs the shared supervised warmup; 'sup'/'arco' continue
    from it via --resume_snapshot (protocol parity with the 2D/3D gates and
    the reference's two-stage recipe — cold-starting ARCO feeds garbage
    pseudo-labels and collapses whole classes; measured in the first
    committed natural run: mean gain -0.138, arco per-class IoUs of 0.0)."""
    from arco_tpu.cli import eval_natural, train_arco_natural
    exp = f"gate/{arm}_s{seed}"
    iters = WARM_ITERS if arm == "warm" else ITERS
    argv = ["--root_path", root, "--dataset", "pascal",
            "--label_num", str(LABEL_NUM), "--model", MODEL,
            "--crop_size", str(HW), "--num_classes", str(K_CLS),
            "--batch_size", "4", "--max_iterations", str(iters),
            "--base_lr", "0.01", "--seed", str(seed),
            "--snapshot_dir", snap, "--exp", exp,
            "--ckpt_every", str(iters), "--log_every", "100"] + SMALL
    if arm in ("sup", "warm"):
        argv += SUP_OFF
    if warm_snapshot:
        argv += ["--resume_snapshot", warm_snapshot]
    train_arco_natural.main(argv)
    if arm == "warm":
        return os.path.join(snap, f"{exp}_{LABEL_NUM}_labeled", MODEL)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        eval_natural.main(
            ["--root_path", root, "--dataset", "pascal",
             "--label_num", str(LABEL_NUM), "--model", MODEL,
             "--crop_size", str(HW), "--num_classes", str(K_CLS),
             "--snapshot_dir", snap, "--exp", exp,
             "--iteration", str(ITERS)])
    line = [ln for ln in buf.getvalue().splitlines()
            if ln.strip().startswith("{")][-1]
    return json.loads(line)


def main():
    global ITERS
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--iters", type=int, default=ITERS)
    ap.add_argument("--mechanism", choices=["shifted", "striped"],
                    default="shifted")
    ap.add_argument("--model", default="unet",
                    help="natural-branch model key (unet / deeplabv2 / "
                         "deeplabv3)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    ITERS = args.iters
    globals()["MECHANISM"] = args.mechanism
    globals()["MODEL"] = args.model

    import jax
    results = {"task": f"natural_{MECHANISM}", "hw": HW,
               "model": MODEL, "n_train": N_TRAIN,
               "label_num": LABEL_NUM, "iters": ITERS,
               "warm_iters": WARM_ITERS,
               "backend": jax.devices()[0].platform, "runs": []}
    work = tempfile.mkdtemp(prefix="natural_gate_")
    try:
        for seed in args.seeds:
            root = os.path.join(work, f"pascal_s{seed}")
            make_fixture(root, seed)
            snap = os.path.join(work, f"snap_s{seed}")
            warm = run_arm(root, snap, "warm", seed)
            sup = run_arm(root, snap, "sup", seed, warm_snapshot=warm)
            arco = run_arm(root, snap, "arco", seed, warm_snapshot=warm)
            run = {"seed": seed, "supervised_miou": round(sup["miou"], 4),
                   "arco_miou": round(arco["miou"], 4),
                   "gain": round(arco["miou"] - sup["miou"], 4),
                   "sup_per_class": [round(x, 4)
                                     for x in sup["per_class_iou"]],
                   "arco_per_class": [round(x, 4)
                                      for x in arco["per_class_iou"]]}
            results["runs"].append(run)
            print(json.dumps(run), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    gains = [r["gain"] for r in results["runs"]]
    results["summary"] = {
        "mean_supervised": round(float(np.mean(
            [r["supervised_miou"] for r in results["runs"]])), 4),
        "mean_arco": round(float(np.mean(
            [r["arco_miou"] for r in results["runs"]])), 4),
        "mean_gain": round(float(np.mean(gains)), 4),
        "min_gain": round(float(np.min(gains)), 4)}
    print(json.dumps(results["summary"]))
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        name = ("quality_gate_natural.json" if MECHANISM == "striped"
                and MODEL == "unet"
                else f"quality_gate_natural_{MECHANISM}"
                + ("" if MODEL == "unet" else f"_{MODEL}") + ".json")
        path = os.path.join(args.out, name)
        with open(path, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
