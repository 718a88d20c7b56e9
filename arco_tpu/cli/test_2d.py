"""2D volume evaluation entry point (reference: test_2D.py).

    python -m arco_tpu.cli.test_2d --root_path ../data/ACDC \
        --exp ACDC/arco --labeled_num 7 --iteration 30000
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

from arco_tpu.data.datasets import SliceDataset
from arco_tpu.eval.slice2d import evaluate_2d
from arco_tpu.models import net_factory
from arco_tpu.train import checkpoint as ckpt


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--root_path", type=str, default="../data/ACDC")
    p.add_argument("--exp", type=str, default="ACDC/example_training")
    p.add_argument("--model", type=str, default="unet")
    p.add_argument("--num_classes", type=int, default=4)
    p.add_argument("--labeled_num", type=int, default=7)
    p.add_argument("--snapshot_dir", type=str, default="../model")
    p.add_argument("--iteration", type=int, default=None,
                   help="checkpoint iteration; default = latest")
    p.add_argument("--startEpoch", type=int, default=None,
                   help="sweep: first checkpoint iteration "
                        "(test_2D.py:140-157 parity)")
    p.add_argument("--endEpoch", type=int, default=None,
                   help="sweep: last checkpoint iteration (inclusive)")
    p.add_argument("--stepEpoch", type=int, default=1000,
                   help="sweep: iteration stride between checkpoints")
    p.add_argument("--input_size", type=int, nargs=2, default=[256, 256])
    p.add_argument("--save_predictions", type=int, default=0,
                   help="write <case>_pred/_img/_gt volumes next to the "
                        "snapshot (npz; .nii.gz when nibabel is available) "
                        "— test_2D.py:93-101 parity")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    snapshot = os.path.join(
        args.snapshot_dir, f"{args.exp}_{args.labeled_num}_labeledfinal",
        args.model)
    steps = ckpt.resolve_steps(snapshot, args.iteration, args.startEpoch,
                               args.endEpoch, args.stepEpoch)
    if len(steps) > 1 and args.save_predictions:
        raise SystemExit("--save_predictions is incompatible with a "
                         "checkpoint sweep; pass --iteration instead")

    model = net_factory(args.model, in_chns=1, class_num=args.num_classes)

    # ONE jitted program for all checkpoints: params/stats are traced
    # arguments, not baked-in constants, so a 30-checkpoint sweep compiles
    # once instead of 30 times (~10 min each on the tunneled backend)
    @jax.jit
    def predict_with(params, stats, x):
        variables = {"params": params}
        if stats:
            variables["batch_stats"] = stats
        logits, _, _ = model.apply(variables, x, train=False,
                                   rngs={"dropout": jax.random.PRNGKey(0)})
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def make_predict(params, stats):
        return lambda x: predict_with(params, stats, x)

    dataset = SliceDataset(args.root_path, split="val",
                           list_name="test.list")

    def load(case):
        idx = dataset.sample_list.index(case)
        return dataset.load(idx)

    # sweep path: evaluate each checkpoint, report per-iteration lines and
    # the best (the reference prints a table and tracks the best epoch)
    if len(steps) > 1:
        best = None
        for s in steps:
            params, stats = ckpt.load_model_params(snapshot, s, None, None)
            res = evaluate_2d(dataset.sample_list, load,
                              make_predict(params, stats),
                              args.num_classes, tuple(args.input_size))
            mean = res["mean"].tolist()
            print(json.dumps({"iteration": s, "mean_dice": mean[0],
                              "mean_jc": mean[1], "mean_hd95": mean[2],
                              "mean_asd": mean[3]}))
            if best is None or mean[0] > best[1]:
                best = (s, mean[0])
        print(json.dumps({"best_iteration": best[0],
                          "best_mean_dice": best[1]}))
        return best

    step = steps[0]
    params, stats = ckpt.load_model_params(snapshot, step, None, None)
    predict = make_predict(params, stats)

    save_dir = None
    if args.save_predictions:
        save_dir = os.path.join(
            args.snapshot_dir,
            f"{args.exp}_{args.labeled_num}_labeledfinal",
            f"{args.model}_predictions")
        os.makedirs(save_dir, exist_ok=True)

    if save_dir:
        from arco_tpu.eval.slice2d import test_single_volume_2d
        from arco_tpu.utils.volume_io import save_volume
        all_metrics = []
        for case in dataset.sample_list:
            image, label = load(case)
            metrics, pred = test_single_volume_2d(
                image, label, predict, args.num_classes,
                tuple(args.input_size))
            save_volume(os.path.join(save_dir, f"{case}_pred"), pred)
            save_volume(os.path.join(save_dir, f"{case}_img"), image)
            save_volume(os.path.join(save_dir, f"{case}_gt"), label)
            all_metrics.append(metrics)
        import numpy as _np
        arr = _np.asarray(all_metrics)
        result = {"per_class": arr.mean(axis=0),
                  "mean": arr.mean(axis=(0, 1)), "raw": arr}
    else:
        result = evaluate_2d(dataset.sample_list, load, predict,
                             args.num_classes, tuple(args.input_size))
    per_class = result["per_class"].tolist()
    mean = result["mean"].tolist()
    print(json.dumps({"iteration": step, "per_class": per_class,
                      "mean_dice": mean[0], "mean_jc": mean[1],
                      "mean_hd95": mean[2], "mean_asd": mean[3]}))
    return result


if __name__ == "__main__":
    main()
