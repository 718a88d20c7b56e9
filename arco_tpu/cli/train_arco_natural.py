"""ARCO training on natural images (Cityscapes / Pascal VOC).

The reference ships the Cityscapes/Pascal data plumbing
(dataset/build_dataset.py) and the DeepLab family (models/deeplab.py,
models/deeplabv3/, models/model_factory.py:19-61) but no natural-image
trainer in this snapshot (SURVEY §0); this entry point closes that gap by
running the same rank-generic ARCO step over the natural-image pipeline
with either a 3-channel U-Net or the reference's DeepLab models:

    python -m arco_tpu.cli.train_arco_natural --root_path ../data/pascal \
        --dataset pascal --label_num 5 \
        --model deeplabv2 --backbone resnet101 \
        [--restore_from /path/to/resnet101-caffe.pth]

--restore_from takes a LOCAL torch checkpoint (the reference downloads its
caffe-pretrained trunks from URLs, model_factory.py:13-16 — unreachable
here) and applies the same partial-copy semantics (only name+shape matches
are taken). DeepLab-v2 trunk BatchNorms are frozen exactly like the
reference (deeplab.py:90-103; train/freeze.apply_deeplab_bn_freeze).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from arco_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

from arco_tpu.config import ArcoConfig
from arco_tpu.data.natural import NaturalImageDataset, class_balanced_idx
from arco_tpu.data.pipeline import TwoStreamPipeline
from arco_tpu.models import net_factory
from arco_tpu.train import checkpoint as ckpt
from arco_tpu.train.arco2d import (init_arco_state, make_arco_modules,
                                   make_arco_step)
from arco_tpu.train.schedule import make_optimizer
from arco_tpu.utils.logging import MetricLogger, log_provenance


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--root_path", type=str, required=True)
    p.add_argument("--dataset", type=str, default="pascal",
                   choices=["pascal", "cityscapes"])
    p.add_argument("--label_num", type=int, default=5)
    p.add_argument("--model", type=str, default="unet",
                   choices=["unet", "deeplabv2", "deeplabv3"])
    p.add_argument("--backbone", type=str, default="resnet101",
                   choices=["resnet50", "resnet101"])
    p.add_argument("--resume_snapshot", type=str, default=None,
                   help="snapshot dir whose latest iter_<N> model "
                        "checkpoint seeds the model (warmup handoff, "
                        "analog of the 2D --resume)")
    p.add_argument("--restore_from", type=str, default=None,
                   help="local torch checkpoint for the DeepLab trunk "
                        "(partial copy, model_factory.py:55-60 semantics)")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--max_iterations", type=int, default=40000)
    p.add_argument("--base_lr", type=float, default=0.01)
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--snapshot_dir", type=str, default="../model")
    p.add_argument("--exp", type=str, default="natural/arco")
    p.add_argument("--apply_aug", type=str, default="cutmix")
    p.add_argument("--crop_size", type=int, default=None,
                   help="override the dataset's default crop (smoke/CI hook)")
    p.add_argument("--num_classes", type=int, default=None,
                   help="override the dataset's class count (smoke/CI hook)")
    p.add_argument("--ckpt_every", type=int, default=1000)
    p.add_argument("--log_every", type=int, default=20)
    p.add_argument("--set", action="append", default=[], metavar="K=V",
                   help="ArcoConfig field override, e.g. --set memobank_size=64")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    defaults = NaturalImageDataset.DEFAULTS[args.dataset]
    num_classes = args.num_classes or defaults["num_classes"]
    crop = ((args.crop_size, args.crop_size) if args.crop_size
            else defaults["crop_size"])

    snapshot_path = os.path.join(args.snapshot_dir,
                                 f"{args.exp}_{args.label_num}_labeled",
                                 args.model)
    os.makedirs(snapshot_path, exist_ok=True)
    # force=True: the axon plugin pre-configures root handlers,
    # which would otherwise make this a silent no-op (no log.txt)
    logging.basicConfig(force=True,
        filename=os.path.join(snapshot_path, "log.txt"),
                        level=logging.INFO)
    logging.getLogger().addHandler(logging.StreamHandler(sys.stdout))
    log_provenance()

    base = NaturalImageDataset(args.root_path, args.dataset, "train",
                               crop_size=crop)
    labeled_idx, unlabeled_idx = class_balanced_idx(
        lambda i: base.load(i)[1], range(len(base)), num_classes,
        args.label_num, seed=args.seed)
    ds_l = NaturalImageDataset(args.root_path, args.dataset, "train",
                               idx_list=[base.idx_list[i]
                                         for i in labeled_idx],
                               crop_size=crop)
    ds_u = NaturalImageDataset(args.root_path, args.dataset, "train",
                               idx_list=[base.idx_list[i]
                                         for i in unlabeled_idx],
                               crop_size=crop)

    overrides = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        cur = getattr(ArcoConfig(), k)
        overrides[k] = (v.lower() in ("1", "true", "yes")
                        if isinstance(cur, bool) else type(cur)(v))
    cfg = ArcoConfig(apply_aug=args.apply_aug, **overrides)
    dtype = jnp.bfloat16
    if args.model == "unet":
        model = net_factory("unet", in_chns=3, class_num=num_classes,
                            dtype=dtype)
        fea_channels, fused_dim = (256, 128, 64, 32, 16), None
    else:
        from arco_tpu.models.deeplab import (deeplab_feature_channels,
                                             model_generator)
        model = model_generator(args.model, args.backbone,
                                num_classes=num_classes, dtype=dtype)
        # fuse the four ResNet stage maps to a 256-ch representation (the
        # reference has no natural trainer; 256 matches DeepLabv3Plus's own
        # representation width, deeplabv3.py:46-51)
        fea_channels = deeplab_feature_channels(args.model, args.backbone)
        fused_dim = 256
    modules = make_arco_modules(model, crop[1], crop[0],
                                batch_size=args.batch_size,
                                feature_channels=fea_channels,
                                fused_dim=fused_dim, dtype=dtype)
    tx = make_optimizer(args.base_lr, args.max_iterations)

    model_params = model_batch_stats = None
    if args.resume_snapshot and args.restore_from:
        raise SystemExit(
            "--resume_snapshot and --restore_from both set: the torch "
            "trunk restore would silently overwrite the warmup handoff; "
            "pass exactly one initializer")
    if args.resume_snapshot:
        # warmup/stage handoff: seed the model (student AND EMA via
        # init_arco_state's copy) from another run's iter_<N> model
        # checkpoint — the natural-branch analog of the 2D --resume
        # handoff (train_arco_2d.py:223-226)
        step = ckpt.latest_step(args.resume_snapshot)
        if step is None:
            raise SystemExit(
                f"--resume_snapshot: no iter_<N> checkpoint under "
                f"{args.resume_snapshot}")
        model_params, model_batch_stats = ckpt.load_model_params(
            args.resume_snapshot, step, None, None)
        logging.info("initialized model from %s iter_%d",
                     args.resume_snapshot, step)
    if args.restore_from:
        import torch
        from arco_tpu.compat.torch_import import (convert_deeplab_state_dict,
                                                  merge_params)
        layers = (3, 4, 23, 3) if "101" in args.backbone else (3, 4, 6, 3)
        sd = torch.load(args.restore_from, map_location="cpu")
        sd = {k.replace("module.", ""): v for k, v in sd.items()}
        imp_params, imp_stats = convert_deeplab_state_dict(sd, layers)
        # init once to get the full tree, then overlay the matching leaves
        init0 = init_arco_state(jax.random.PRNGKey(args.seed), modules, cfg,
                                (args.batch_size,) + crop + (3,), tx)
        model_params = merge_params(init0.params["model"], imp_params)
        model_batch_stats = merge_params(init0.batch_stats["model"],
                                         imp_stats)
        logging.info("restored DeepLab trunk from %s", args.restore_from)

    state = init_arco_state(
        jax.random.PRNGKey(args.seed), modules, cfg,
        (args.batch_size,) + crop + (3,), tx,
        model_params=model_params, model_batch_stats=model_batch_stats)
    if args.model == "deeplabv2":
        # the reference freezes every trunk BatchNorm (deeplab.py:90-103)
        from arco_tpu.train.freeze import apply_deeplab_bn_freeze
        tx = apply_deeplab_bn_freeze(tx, state.params)
        state = state._replace(opt_state=tx.init(state.params))
    step_fn = make_arco_step(modules, cfg, tx, num_classes,
                             args.max_iterations)

    pipeline = TwoStreamPipeline(ds_l, ds_u, args.batch_size,
                                 seed=args.seed)
    logger = MetricLogger(snapshot_path)
    t0 = time.time()
    for it, batch in enumerate(pipeline, start=1):
        dev = {"image_l": jnp.asarray(batch["image_l"]),
               "label_l": jnp.asarray(batch["label_l"]),
               "image_u": jnp.asarray(batch["image_u"])}
        state, metrics = step_fn(state, dev)
        metrics.pop("pred_l_label", None)
        if it % args.log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            ips = args.log_every * args.batch_size * 2 / (time.time() - t0)
            t0 = time.time()
            logger.log(it, {**m, "images_per_sec": ips})
            logging.info("iter %d loss %.4f (%.1f img/s)", it, m["loss"],
                         ips)
        if it % args.ckpt_every == 0:
            ckpt.save_model_state(snapshot_path, it, state)
            ckpt.save_full_state(snapshot_path, it, state)
        if it >= args.max_iterations:
            break
    pipeline.close()
    final_it = int(state.step)
    if final_it % args.ckpt_every:
        ckpt.save_model_state(snapshot_path, final_it, state)
    ckpt.save_full_state(snapshot_path, final_it, state)


if __name__ == "__main__":
    main()
