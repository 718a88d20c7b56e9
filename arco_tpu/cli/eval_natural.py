"""Natural-image (Cityscapes/Pascal) evaluation: mean IoU / per-class IoU.

Reference parity: the snapshot ships the natural-image data pipeline and
IoU utilities (dataloaders/utils.py:145-171) but no eval script; this
entry point evaluates a trained checkpoint with the standard mIoU protocol.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from arco_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

from arco_tpu.data.natural import NaturalImageDataset
from arco_tpu.models import net_factory
from arco_tpu.train import checkpoint as ckpt


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--root_path", type=str, required=True)
    p.add_argument("--dataset", type=str, default="pascal",
                   choices=["pascal", "cityscapes"])
    p.add_argument("--model", type=str, default="unet")
    p.add_argument("--backbone", type=str, default="resnet101",
                   choices=["resnet50", "resnet101"])
    p.add_argument("--label_num", type=int, default=5)
    p.add_argument("--snapshot_dir", type=str, default="../model")
    p.add_argument("--exp", type=str, default="natural/arco")
    p.add_argument("--iteration", type=int, default=None)
    p.add_argument("--crop_size", type=int, default=None,
                   help="override the dataset's default crop (smoke/CI hook)")
    p.add_argument("--num_classes", type=int, default=None,
                   help="override the dataset's class count (smoke/CI hook)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    defaults = NaturalImageDataset.DEFAULTS[args.dataset]
    num_classes = args.num_classes or defaults["num_classes"]

    snapshot = os.path.join(args.snapshot_dir,
                            f"{args.exp}_{args.label_num}_labeled",
                            args.model)
    step = args.iteration or ckpt.latest_step(snapshot)
    if step is None:
        raise SystemExit(f"no checkpoint under {snapshot}")
    params, stats = ckpt.load_model_params(snapshot, step, None, None)

    if args.model.startswith("deeplab"):
        from arco_tpu.models.deeplab import model_generator
        model = model_generator(args.model, args.backbone,
                                num_classes=num_classes)
    else:
        model = net_factory(args.model, in_chns=3, class_num=num_classes)

    @jax.jit
    def predict(x):
        variables = {"params": params}
        if stats:
            variables["batch_stats"] = stats
        logits, _, _ = model.apply(variables, x, train=False,
                                   rngs={"dropout": jax.random.PRNGKey(0)})
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    crop = ((args.crop_size, args.crop_size) if args.crop_size else None)
    ds = NaturalImageDataset(args.root_path, args.dataset, "val",
                             crop_size=crop)
    inter = np.zeros(num_classes, np.int64)
    union = np.zeros(num_classes, np.int64)
    rng = np.random.RandomState(0)
    for i in range(len(ds)):
        sample = ds.get(i, rng)
        pred = np.asarray(predict(jnp.asarray(sample["image"][None])))[0]
        label = sample["label"]
        valid = label >= 0
        for c in range(num_classes):
            pc = (pred == c) & valid
            lc = label == c
            inter[c] += np.logical_and(pc, lc).sum()
            union[c] += np.logical_or(pc, lc).sum()
    iou = np.where(union > 0, inter / np.maximum(union, 1), np.nan)
    print(json.dumps({"iteration": step, "miou": float(np.nanmean(iou)),
                      "per_class_iou": iou.tolist()}))


if __name__ == "__main__":
    main()
