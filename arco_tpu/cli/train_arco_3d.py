"""ARCO stage-2 3D training entry point (reference: train_arco_3d.py).

    python -m arco_tpu.cli.train_arco_3d --root_path ../data/LA \
        --exp LA/arco --labeled_num 8 --max_iterations 6000

3D differences from the 2D path, mirrored from the reference:
- V-Net backbone, patch [112,112,80], fused feature dim 16
  (train_arco_3d.py:148,208-216);
- no photometric/AdvMorph strong aug (augment_3d.py:209-226 passthrough);
- the TPS-equivariance loss is computed for logging only and excluded from
  the total (train_arco_3d.py:390-391) — flag-gated here;
- train budget 6000 iterations, batch 4.
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

from arco_tpu.config import TrainConfig, parse_args
from arco_tpu.data.datasets import LAHeartDataset
from arco_tpu.data.pipeline import TwoStreamPipeline
from arco_tpu.models import net_factory_3d
from arco_tpu.train import checkpoint as ckpt
from arco_tpu.train.arco2d import (init_arco_state, make_arco_modules,
                                   make_arco_step)
from arco_tpu.train.schedule import make_optimizer
from arco_tpu.utils.logging import MetricLogger, log_provenance


def default_3d_config() -> TrainConfig:
    cfg = TrainConfig()
    cfg.data.patch_size = (112, 112, 80)
    cfg.data.num_classes = 2
    cfg.data.labeled_num = 8   # index into train.list (LAHeartWithIndex)
    cfg.optim.max_iterations = 6000
    cfg.model = "vnet"
    cfg.arco.use_eqv_loss = False
    cfg.arco.compute_eqv = True
    # DEFAULT ON from round 5: the eqv term is excluded from the 3D loss
    # (train_arco_3d.py:390-391), so the every-step forward only nudges BN
    # running stats — and the paired 3-seed trajectory measurement
    # (docs/artifacts/ref_parity/trajectory_3d_arco_noeqv.json vs
    # trajectory_3d_arco_s012.json) shows the nudge HURTS end Dice on all
    # three seeds (-0.054/-0.012/-0.038) while the leg costs ~43% of the
    # step (767 -> ~435 ms). eqv is still computed exactly on logging
    # iterations; --arco.eqv_on_log_only false restores every-step parity.
    cfg.arco.eqv_on_log_only = True
    cfg.arco.use_photometric = False
    cfg.arco.use_adv_morph = False
    # Round-1 needed remat (jax.checkpoint on the student forwards) to fit
    # the five V-Net forwards at [112,112,80] in 16 GB HBM; after the
    # composed-kernel FeatureExtractor and the stop-grad eqv forward the
    # step fits WITHOUT remat and runs 825 -> 767 ms/step measured on chip
    # (433 ms with the eqv forward off). Re-enable with --arco.remat true
    # if a bigger batch/patch OOMs. Loss-equivalence: tests/test_remat.py.
    cfg.arco.remat = False
    # the 3D reference seeds each class bank with a RANDN row
    # (train_arco_3d.py:149) — on 2-class LA it is the only negative the
    # whole run (losses.contrastive.create_memobank)
    cfg.arco.memobank_init = "randn"
    return cfg


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
    patch = tuple(cfg.data.patch_size)
    # reference batch semantics: batch_size is the TOTAL per-step batch,
    # labeled_bs of it labeled (train_arco_2d.py:35-36)
    bs = cfg.data.batch_size
    b_l = cfg.data.labeled_bs
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    model = net_factory_3d(cfg.model, in_chns=cfg.data.in_channels,
                           class_num=num_classes, dtype=dtype)
    modules = make_arco_modules(
        model, patch[1], patch[0], batch_size=b_l, total_batch=bs,
        feature_channels=(128, 64, 32, 16, 16), fused_dim=16,
        tps_sigma=cfg.arco.tps_sigma, dtype=dtype)
    tx = make_optimizer(cfg.optim.base_lr, cfg.optim.max_iterations,
                        cfg.optim.weight_decay, cfg.optim.momentum,
                        cfg.optim.nesterov, cfg.optim.poly_power)

    model_params = model_stats = None
    if cfg.resume:
        resume_dir = os.path.join(
            cfg.snapshot_dir,
            f"{cfg.resume}_{cfg.data.labeled_num}_labeledfinal", cfg.model)
        step = ckpt.latest_step(resume_dir)
        if step is not None:
            logging.info("loading stage-1 checkpoint iter_%d", step)
            model_params, model_stats = ckpt.load_model_params(
                resume_dir, step, None, None)

    state = init_arco_state(
        jax.random.PRNGKey(cfg.seed), modules, cfg.arco,
        (b_l,) + patch + (cfg.data.in_channels,), tx,
        model_params=model_params, model_batch_stats=model_stats)

    # crash recovery: resume the FULL state from this experiment's own
    # latest rolling full checkpoint (same elasticity as the 2D trainer)
    own_step = ckpt.latest_full_step(snapshot_path)
    if own_step:
        logging.info("resuming full train state from full_iter_%d", own_step)
        state = ckpt.restore_full_state(snapshot_path, own_step, state)
    elif ckpt.latest_step(snapshot_path):
        mstep = ckpt.latest_step(snapshot_path)
        logging.info("degraded resume from model checkpoint iter_%d", mstep)
        state = ckpt.restore_model_fallback(snapshot_path, mstep, state, tx)

    step_fn = make_arco_step(modules, cfg.arco, tx, num_classes,
                             cfg.optim.max_iterations)
    # --arco.eqv_on_log_only: the eqv term is logging-only on this path
    # (use_eqv_loss=False, train_arco_3d.py:390-391), so off-logging
    # iterations can run a second compiled step without the eqv leg
    # (slice-wise TPS gather + 6th forward, ~43% of the step). Both
    # programs share the state pytree; loss_eqv is a real value exactly on
    # the iterations that log it.
    step_fn_noeqv = None
    if (cfg.arco.eqv_on_log_only and cfg.arco.compute_eqv
            and not cfg.arco.use_eqv_loss):
        import dataclasses
        step_fn_noeqv = make_arco_step(
            modules, dataclasses.replace(cfg.arco, compute_eqv=False), tx,
            num_classes, cfg.optim.max_iterations)

    ds_l = LAHeartDataset(cfg.data.root_path, "train",
                          index=cfg.data.labeled_num, label_type=1,
                          patch_size=patch)
    ds_u = LAHeartDataset(cfg.data.root_path, "train",
                          index=cfg.data.labeled_num, label_type=0,
                          patch_size=patch)
    # device-resident data path (data/device_bank.py): volumes staged in
    # HBM once, crop/rot/flip on device, ~100 bytes host->device per step.
    # The RNG stream matches the single-worker host pipeline exactly.
    banks = None
    if cfg.data.device_data:
        from arco_tpu.data.device_bank import DeviceVolumeBank
        try:
            banks = (DeviceVolumeBank.from_dataset(ds_l, patch),
                     DeviceVolumeBank.from_dataset(ds_u, patch))
            logging.info("device data path: %d + %d volumes staged in HBM",
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
    loss_history = logger.load_history_pickle(snapshot_path)[:start_it]
    pending = []
    if start_it >= cfg.optim.max_iterations:
        batches = iter(())  # resumed at completion: nothing left to train
    for it, batch in enumerate(batches, start=start_it + 1):
        dev_batch = {"image_l": jnp.asarray(batch["image_l"]),
                     "label_l": jnp.asarray(batch["label_l"]),
                     "image_u": jnp.asarray(batch["image_u"])}
        fn = (step_fn if step_fn_noeqv is None or it % cfg.log_every == 0
              else step_fn_noeqv)
        state, metrics = fn(state, dev_batch)
        metrics.pop("pred_l_label")
        pending.append(metrics["loss"])
        if it % cfg.log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            vps = cfg.log_every * bs / (time.time() - t0)
            t0 = time.time()
            logger.log(it, {**m, "volumes_per_sec": vps})
            logging.info(
                "iteration %d : loss : %f, reco: %f, unsup: %f (%.2f vol/s)",
                it, m["loss"], m["reco_loss"], m["unsup_loss"], vps)
        if it % cfg.ckpt_every == 0:
            loss_history.extend(float(v) for v in jax.device_get(pending))
            pending.clear()
            logger.log_history_pickle(snapshot_path, loss_history)
            ckpt.save_model_state(snapshot_path, it, state)
            if it % (cfg.full_ckpt_every or cfg.ckpt_every) == 0:
                ckpt.save_full_state(snapshot_path, it, state)
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
    cfg = parse_args(argv, base=default_3d_config())
    snapshot_path = os.path.join(
        cfg.snapshot_dir, f"{cfg.exp}_{cfg.data.labeled_num}_labeledfinal",
        cfg.model)
    train(cfg, snapshot_path)


if __name__ == "__main__":
    main()
