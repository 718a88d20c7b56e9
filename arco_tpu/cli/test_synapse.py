"""Synapse / LiTS volume evaluation entry point.

Parity target: code/test.py (the reference file imports a module missing
from its tree and cannot run, SURVEY §7.4; this is the working equivalent):
per-case h5 volumes, slice-wise zoomed forward like the ACDC protocol, with
the Synapse 8-class / LiTS 3-class label sets.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp

from arco_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

from arco_tpu.data.datasets import SynapseDataset
from arco_tpu.eval.slice2d import evaluate_2d
from arco_tpu.models import net_factory
from arco_tpu.train import checkpoint as ckpt


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--root_path", type=str, default="../data/Synapse")
    p.add_argument("--list_dir", type=str, default=None)
    p.add_argument("--exp", type=str, default="Synapse/example")
    p.add_argument("--model", type=str, default="unet")
    p.add_argument("--num_classes", type=int, default=8)
    p.add_argument("--labeled_num", type=int, default=5)
    p.add_argument("--snapshot_dir", type=str, default="../model")
    p.add_argument("--iteration", type=int, default=None)
    p.add_argument("--input_size", type=int, nargs=2, default=[256, 256])
    p.add_argument("--lits", type=int, default=0)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    snapshot = os.path.join(
        args.snapshot_dir, f"{args.exp}_{args.labeled_num}_labeledfinal",
        args.model)
    step = args.iteration or ckpt.latest_step(snapshot)
    if step is None:
        raise SystemExit(f"no checkpoint found under {snapshot}")
    params, stats = ckpt.load_model_params(snapshot, step, None, None)

    model = net_factory(args.model, in_chns=1, class_num=args.num_classes)

    @jax.jit
    def predict(x):
        variables = {"params": params}
        if stats:
            variables["batch_stats"] = stats
        logits, _, _ = model.apply(variables, x, train=False,
                                   rngs={"dropout": jax.random.PRNGKey(0)})
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    dataset = SynapseDataset(args.root_path,
                             args.list_dir or args.root_path,
                             split="test_vol", lits=bool(args.lits))

    def load(case):
        idx = dataset.sample_list.index(case)
        return dataset.load(idx)

    result = evaluate_2d(dataset.sample_list, load, predict,
                         args.num_classes, tuple(args.input_size))
    mean = result["mean"].tolist()
    print(json.dumps({"iteration": step, "mean_dice": mean[0],
                      "mean_jc": mean[1], "mean_hd95": mean[2],
                      "mean_asd": mean[3]}))
    return result


if __name__ == "__main__":
    main()
