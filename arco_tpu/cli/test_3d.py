"""3D sliding-window evaluation entry point (reference: test_3D.py).

    python -m arco_tpu.cli.test_3d --root_path ../data/LA --exp LA/arco

Supports the reference's checkpoint sweep (test_3D.py:39-41 iterates
1000..30000): --startEpoch/--endEpoch/--stepEpoch evaluate every saved
checkpoint in range and report the best.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp

from arco_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

from arco_tpu.data.datasets import LAHeartDataset
from arco_tpu.eval.sliding_window import evaluate_3d
from arco_tpu.models import net_factory_3d
from arco_tpu.train import checkpoint as ckpt


def _make_predict(model):
    # ONE jitted program reused across the checkpoint sweep: params/stats
    # are traced arguments, not baked-in constants (one compile, not N)
    @jax.jit
    def predict_with(params, stats, x):
        variables = {"params": params}
        if stats:
            variables["batch_stats"] = stats
        logits, _, _ = model.apply(variables, x, train=False,
                                   rngs={"dropout": jax.random.PRNGKey(0)})
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return predict_with


def _evaluate_checkpoint(args, predict_with, dataset, load, params, stats):
    predict = lambda x: predict_with(params, stats, x)

    if args.device_eval:
        import numpy as np
        from arco_tpu.eval.sliding_window import (
            largest_connected_component)
        from arco_tpu.eval.sliding_window_device import \
            test_single_case_3d_device
        from arco_tpu.utils.metrics import calculate_metric_percase
        metrics = []
        for case in dataset.sample_list:
            image, label = load(case)
            pred, _ = test_single_case_3d_device(
                predict, image, args.stride_xy, args.stride_z,
                tuple(args.patch_size), args.num_classes)
            if args.nms:
                pred = largest_connected_component(pred)
            metrics.append([calculate_metric_percase(pred == c, label == c)
                            for c in range(1, args.num_classes)])
        arr = np.asarray(metrics)
        return {"per_class": arr.mean(axis=0),
                "mean": arr.mean(axis=(0, 1)), "raw": arr}
    return evaluate_3d(dataset.sample_list, load, predict,
                       args.num_classes, tuple(args.patch_size),
                       args.stride_xy, args.stride_z,
                       use_nms=bool(args.nms))


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--root_path", type=str, default="../data/LA")
    p.add_argument("--exp", type=str, default="LA/example")
    p.add_argument("--model", type=str, default="vnet")
    p.add_argument("--num_classes", type=int, default=2)
    p.add_argument("--labeled_num", type=int, default=8)
    p.add_argument("--snapshot_dir", type=str, default="../model")
    p.add_argument("--iteration", type=int, default=None)
    p.add_argument("--startEpoch", type=int, default=None,
                   help="sweep: first checkpoint iteration")
    p.add_argument("--endEpoch", type=int, default=None,
                   help="sweep: last checkpoint iteration (inclusive)")
    p.add_argument("--stepEpoch", type=int, default=1000,
                   help="sweep: iteration stride")
    p.add_argument("--patch_size", type=int, nargs=3, default=[112, 112, 80])
    p.add_argument("--stride_xy", type=int, default=18)
    p.add_argument("--stride_z", type=int, default=4)
    p.add_argument("--nms", type=int, default=0)
    p.add_argument("--device_eval", type=int, default=1,
                   help="1: compile the whole sliding-window case on device "
                        "(eval/sliding_window_device.py); 0: host-batched")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    snapshot = os.path.join(
        args.snapshot_dir, f"{args.exp}_{args.labeled_num}_labeledfinal",
        args.model)
    steps = ckpt.resolve_steps(snapshot, args.iteration, args.startEpoch,
                               args.endEpoch, args.stepEpoch)

    model = net_factory_3d(args.model, in_chns=1, class_num=args.num_classes)
    predict_with = _make_predict(model)
    dataset = LAHeartDataset(args.root_path, split="test")

    def load(case):
        idx = dataset.sample_list.index(case)
        return dataset.load(idx)

    best = None
    result = None
    for s in steps:
        params, stats = ckpt.load_model_params(snapshot, s, None, None)
        result = _evaluate_checkpoint(args, predict_with, dataset, load,
                                      params, stats)
        mean = result["mean"].tolist()
        print(json.dumps({"iteration": s, "mean_dice": mean[0],
                          "mean_jc": mean[1], "mean_hd95": mean[2],
                          "mean_asd": mean[3]}))
        if best is None or mean[0] > best[1]:
            best = (s, mean[0])
    if len(steps) > 1:
        print(json.dumps({"best_iteration": best[0],
                          "best_mean_dice": best[1]}))
        return best
    return result


if __name__ == "__main__":
    main()
