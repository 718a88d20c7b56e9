"""ARCO stage-2 2D training entry point.

CLI-compatible with the reference (train_arco_2d.py:26-89): the reference
flags work directly, e.g.

    python -m arco_tpu.cli.train_arco_2d --root_path ../data/ACDC \
        --exp ACDC/arco --labeled_num 7 --max_iterations 30000

plus dotted overrides for every config field (--arco.num_queries 256).
"""

from __future__ import annotations

import logging
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from arco_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

from arco_tpu.config import TrainConfig, parse_args, patients_to_slices
from arco_tpu.data.datasets import SliceDataset, SynapseDataset
from arco_tpu.data.pipeline import TwoStreamPipeline
from arco_tpu.models import net_factory
from arco_tpu.train import checkpoint as ckpt
from arco_tpu.train.arco2d import (init_arco_state, make_arco_modules,
                                   make_arco_step)
from arco_tpu.train.schedule import make_optimizer
from arco_tpu.utils.logging import MetricLogger, log_provenance


def build_datasets(cfg: TrainConfig):
    exp = cfg.exp
    labeled_slice = patients_to_slices(exp, cfg.data.labeled_num)
    common = dict(output_size=cfg.data.patch_size)
    if "Syn" in exp or "syn" in exp or "Lits" in exp or "LiTS" in exp \
            or "jhu" in exp or "JHU" in exp:
        lits = "Lits" in exp or "LiTS" in exp
        list_dir = cfg.data.list_dir or cfg.data.root_path
        ds_l = SynapseDataset(cfg.data.root_path, list_dir, "train",
                              index=labeled_slice, label_type=1, lits=lits,
                              **common)
        ds_u = SynapseDataset(cfg.data.root_path, list_dir, "train",
                              index=labeled_slice, label_type=0, lits=lits,
                              **common)
    else:
        ds_l = SliceDataset(cfg.data.root_path, "train", index=labeled_slice,
                            label_type=1, **common)
        ds_u = SliceDataset(cfg.data.root_path, "train", index=labeled_slice,
                            label_type=0, **common)
    return ds_l, ds_u


def train(cfg: TrainConfig, snapshot_path: str):
    os.makedirs(snapshot_path, exist_ok=True)
    # force=True: the axon plugin pre-configures root handlers,
    # which would otherwise make this a silent no-op (no log.txt)
    logging.basicConfig(
        force=True,
        filename=os.path.join(snapshot_path, "log.txt"), level=logging.INFO,
        format="[%(asctime)s.%(msecs)03d] %(message)s", datefmt="%H:%M:%S")
    logging.getLogger().addHandler(logging.StreamHandler(sys.stdout))
    log_provenance()
    logging.info(str(cfg))

    num_classes = cfg.data.num_classes
    h, w = cfg.data.patch_size
    # reference batch semantics: batch_size is the TOTAL per-step batch,
    # labeled_bs of it labeled (train_arco_2d.py:35-36)
    bs = cfg.data.batch_size
    b_l = cfg.data.labeled_bs
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    model = net_factory(cfg.model, in_chns=cfg.data.in_channels,
                        class_num=num_classes, dtype=dtype)
    modules = make_arco_modules(model, w, h, batch_size=b_l, total_batch=bs,
                                tps_sigma=cfg.arco.tps_sigma, dtype=dtype)
    tx = make_optimizer(cfg.optim.base_lr, cfg.optim.max_iterations,
                        cfg.optim.weight_decay, cfg.optim.momentum,
                        cfg.optim.nesterov, cfg.optim.poly_power)

    # stage-1 handoff (train_arco_2d.py:223-226)
    model_params = model_stats = None
    if cfg.resume:
        resume_dir = os.path.join(
            cfg.snapshot_dir,
            f"{cfg.resume}_{cfg.data.labeled_num}_labeledfinal", cfg.model)
        step = ckpt.latest_step(resume_dir)
        if step is not None:
            logging.info("loading stage-1 checkpoint iter_%d from %s", step,
                         resume_dir)
            model_params, model_stats = ckpt.load_model_params(
                resume_dir, step, None, None)

    # local ImageNet-pretrained backbone ingestion (ViT .npz / Swin .pth /
    # EfficientNet .pth), the reference's load_from equivalents
    if cfg.pretrained_path and model_params is None:
        from arco_tpu.compat.pretrained import load_pretrained
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((1, h, w, cfg.data.in_channels)), train=False)
        model_params, model_stats = load_pretrained(
            cfg.model, cfg.pretrained_path, variables["params"],
            variables.get("batch_stats"))
        logging.info("loaded pretrained backbone from %s",
                     cfg.pretrained_path)

    state = init_arco_state(jax.random.PRNGKey(cfg.seed), modules, cfg.arco,
                            (b_l, h, w, cfg.data.in_channels), tx,
                            model_params=model_params,
                            model_batch_stats=model_stats)

    # crash recovery: resume the FULL state (params, EMA, optimizer, queues,
    # memobank, PRNG) from this experiment's own latest rolling full
    # checkpoint — the elasticity the reference lacks (SURVEY §5
    # failure-detection row)
    own_step = ckpt.latest_full_step(snapshot_path)
    if own_step:
        logging.info("resuming full train state from full_iter_%d", own_step)
        state = ckpt.restore_full_state(snapshot_path, own_step, state)
    elif ckpt.latest_step(snapshot_path):
        # degraded resume: weights/EMA from the newest iter_<N> checkpoint,
        # LR schedule fast-forwarded; optimizer momentum + banks refresh
        mstep = ckpt.latest_step(snapshot_path)
        logging.info("degraded resume from model checkpoint iter_%d", mstep)
        state = ckpt.restore_model_fallback(snapshot_path, mstep, state, tx)

    step_fn = make_arco_step(modules, cfg.arco, tx, num_classes,
                             cfg.optim.max_iterations,
                             output_size=cfg.data.patch_size)

    ds_l, ds_u = build_datasets(cfg)
    # device-resident data path (data/device_bank.py): slices staged in
    # HBM, rot90/flip/rotate on device, ~100 bytes host->device per step
    # (the tunneled backend leaks every transfer's host buffer; the host
    # pipeline's ~3 MB/step adds up over a 30k run). Batches are
    # bit-identical to the single-worker host pipeline.
    banks = None
    if cfg.data.device_data:
        from arco_tpu.data.device_bank import DeviceSliceBank
        try:
            banks = (DeviceSliceBank.from_dataset(ds_l),
                     DeviceSliceBank.from_dataset(ds_u))
            logging.info("device data path: %d + %d slices staged in HBM",
                         len(ds_l), len(ds_u))
        except ValueError as e:
            logging.info("device data path unavailable (%s); "
                         "using the host pipeline", e)

    if banks is None:
        pipeline = TwoStreamPipeline(ds_l, ds_u, bs, seed=cfg.seed,
                                     labeled_bs=b_l)
        batches = iter(pipeline)
    else:
        pipeline = None
        from arco_tpu.data.device_bank import two_stream_device_batches
        batches = two_stream_device_batches(
            banks[0], banks[1], b_l, bs - b_l, cfg.seed,
            n_l=len(ds_l), n_u=len(ds_u))

    logger = MetricLogger(snapshot_path)

    t0 = time.time()
    start_it = int(state.step)
    # record.pkl parity incl. resume (train_arco_2d.py:437,477-478): start
    # from any previously written history, trimmed to the resume step
    loss_history = logger.load_history_pickle(snapshot_path)[:start_it]
    pending = []  # device scalars since the last flush — no host sync
    if start_it >= cfg.optim.max_iterations:
        batches = iter(())
    for it, batch in enumerate(batches, start=start_it + 1):
        dev_batch = {"image_l": jnp.asarray(batch["image_l"]),
                     "label_l": jnp.asarray(batch["label_l"]),
                     "image_u": jnp.asarray(batch["image_u"])}
        state, metrics = step_fn(state, dev_batch)
        pred_l_label = metrics.pop("pred_l_label")
        # reference appends loss.item() EVERY iteration (train_arco_2d.py:437)
        pending.append(metrics["loss"])
        if it % cfg.log_every == 0:
            metrics = {k: float(v) for k, v in metrics.items()}
            ips = cfg.log_every * bs / (time.time() - t0)
            t0 = time.time()
            logger.log(it, {**metrics, "images_per_sec": ips})
            logging.info(
                "iteration %d : loss : %f, loss_ce: %f, loss_dice: %f, "
                "reco_loss: %f, unsup_loss: %f, loss_eqv: %f (%.1f img/s)",
                it, metrics["loss"], metrics["loss_ce"],
                metrics["loss_dice"], metrics["reco_loss"],
                metrics["unsup_loss"], metrics["loss_eqv"], ips)
        if it % (cfg.log_every * 10) == 0:
            # TB image grids every ~10 log intervals, sample index 1 as in
            # the reference (train_arco_2d.py:441-459: Image / Prediction /
            # GroundTruth, argmax prediction scaled x50)
            idx = min(1, b_l - 1)
            logger.log_images(it, {
                "train/Image": batch["image_l"][idx],
                "train/Prediction": np.asarray(pred_l_label[idx]),
                "train/GroundTruth": batch["label_l"][idx].astype("int32")})
        if it % cfg.ckpt_every == 0:
            # flush the pending loss scalars so record.pkl stays in sync
            # with the checkpoint and no unbounded device-buffer list grows
            loss_history.extend(float(v) for v in jax.device_get(pending))
            pending.clear()
            # history FIRST: the checkpoint saves below can stall/crash on
            # a tunnel outage, and record.pkl must not lose the interval
            logger.log_history_pickle(snapshot_path, loss_history)
            # reference-style model checkpoint per cadence + rolling full
            # state for crash resume (the pool/banks are GB-scale)
            ckpt.save_model_state(snapshot_path, it, state)
            if it % (cfg.full_ckpt_every or cfg.ckpt_every) == 0:
                ckpt.save_full_state(snapshot_path, it, state)
            logging.info("saved checkpoint iter_%d", it)
        if it >= cfg.optim.max_iterations:
            break
    if pipeline is not None:
        pipeline.close()
    final_it = int(state.step)
    if final_it % cfg.ckpt_every:
        ckpt.save_model_state(snapshot_path, final_it, state)
    ckpt.save_full_state(snapshot_path, final_it, state)
    loss_history.extend(float(v) for v in jax.device_get(pending))
    logger.log_history_pickle(snapshot_path, loss_history)
    return "Training Finished!"


def main(argv=None):
    cfg = parse_args(argv)
    # reference ablation flag (train_arco_2d.py:76):
    # 0 all terms, 1 no reco (contrastive), 2 no unsup
    if cfg.isd.combinations == 1:
        cfg.arco.compute_contrastive = False
    elif cfg.isd.combinations == 2:
        cfg.arco.compute_unsup = False
    suffix = "final"
    snapshot_path = os.path.join(
        cfg.snapshot_dir, f"{cfg.exp}_{cfg.data.labeled_num}_labeled{suffix}",
        cfg.model)
    train(cfg, snapshot_path)


if __name__ == "__main__":
    main()
