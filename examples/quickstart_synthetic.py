"""Quickstart: the full two-stage ARCO pipeline on synthetic data.

No datasets needed — generates an ACDC-shaped synthetic set, runs stage-1
ISD pretraining, stage-2 ARCO training consuming the stage-1 checkpoint,
then volume evaluation. Mirrors exactly what tests/test_cli_pipeline.py
asserts, as a runnable walkthrough:

    python examples/quickstart_synthetic.py
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Pin the CPU backend BEFORE any jax use: this walkthrough runs tiny
# shapes, and the axon sitecustomize would otherwise force the tunneled
# TPU backend (env JAX_PLATFORMS=cpu alone is not enough; see
# tests/conftest.py).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from arco_tpu.config import TrainConfig
from arco_tpu.data.synthetic import make_acdc_like


def small_config(data_root, model_dir, exp):
    cfg = TrainConfig()
    cfg.exp = exp
    cfg.data.root_path = data_root
    cfg.data.patch_size = (32, 32)
    cfg.data.num_classes = 3
    cfg.data.batch_size = 2
    cfg.data.labeled_bs = 1
    cfg.data.labeled_num = 1
    cfg.optim.max_iterations = 10
    cfg.ckpt_every = 10
    cfg.log_every = 5
    cfg.snapshot_dir = model_dir
    cfg.compute_dtype = "float32"
    cfg.isd.K = 2
    cfg.isd.latent_feature_size = 32
    cfg.isd.output_pooling_size = 4
    cfg.isd.patch_size = 16
    cfg.arco.K = 2
    cfg.arco.num_queries = 16
    cfg.arco.num_negatives = 8
    cfg.arco.memobank_size = 64
    cfg.arco.memobank_size_bg = 64
    cfg.arco.memobank_enqueue = 16
    cfg.arco.topk = 2
    return cfg


def main():
    from arco_tpu.cli import pretrain_2d, train_arco_2d

    workdir = tempfile.mkdtemp(prefix="arco_quickstart_")
    data = make_acdc_like(os.path.join(workdir, "ACDC"), n_train=30,
                          n_val=1, size=(32, 32), num_classes=3)
    model_dir = os.path.join(workdir, "model")

    print("== stage 1: ISD pretraining ==")
    cfg1 = small_config(data, model_dir, "ACDC/pretrain")
    snap1 = os.path.join(model_dir, "ACDC/pretrain_1_labeledfinal", "unet")
    pretrain_2d.train(cfg1, snap1)

    print("== stage 2: ARCO ==")
    cfg2 = small_config(data, model_dir, "ACDC/arco")
    cfg2.resume = "ACDC/pretrain"
    snap2 = os.path.join(model_dir, "ACDC/arco_1_labeledfinal", "unet")
    train_arco_2d.train(cfg2, snap2)

    print("== evaluation ==")
    from arco_tpu.data.datasets import SliceDataset
    from arco_tpu.eval.slice2d import evaluate_2d
    from arco_tpu.inference import Segmenter

    seg = Segmenter.from_snapshot(snap2, num_classes=3,
                                  input_size=(32, 32))
    val = SliceDataset(data, "val", list_name="val.list")
    res = evaluate_2d(val.sample_list,
                      lambda c: val.load(val.sample_list.index(c)),
                      seg._predict, 3, input_size=(32, 32))
    print(json.dumps({"mean_dice": float(res["mean"][0]),
                      "mean_hd95": float(res["mean"][2])}))
    print("artifacts in", workdir)


if __name__ == "__main__":
    main()
