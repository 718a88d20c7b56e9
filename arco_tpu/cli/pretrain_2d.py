"""Stage-1 ISD pretraining entry point (reference: pretrain_2D.py).

    python -m arco_tpu.cli.pretrain_2d --root_path ../data/ACDC \
        --exp ACDC/pretrain --labeled_num 7 --max_iterations 30000
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
from arco_tpu.data.datasets import SliceDataset
from arco_tpu.data.samplers import TwoStreamBatchSampler
from arco_tpu.models import net_factory
from arco_tpu.train import checkpoint as ckpt
from arco_tpu.train.pretrain import (init_pretrain_state, make_isd_modules,
                                     make_pretrain_step)
from arco_tpu.train import freeze
from arco_tpu.train.schedule import make_optimizer
from arco_tpu.utils.logging import MetricLogger, log_provenance


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
    bs = cfg.data.batch_size
    labeled_bs = cfg.data.labeled_bs
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    model = net_factory(cfg.model, in_chns=cfg.data.in_channels,
                        class_num=num_classes, dtype=dtype)
    modules = make_isd_modules(
        model, num_classes=num_classes,
        latent_feature_size=cfg.isd.latent_feature_size,
        latent_pooling_size=cfg.isd.latent_pooling_size,
        output_pooling_size=cfg.isd.output_pooling_size, dtype=dtype)
    tx = make_optimizer(cfg.optim.base_lr, cfg.optim.max_iterations,
                        cfg.optim.weight_decay, cfg.optim.momentum,
                        cfg.optim.nesterov, cfg.optim.poly_power)
    state = init_pretrain_state(jax.random.PRNGKey(cfg.seed), modules,
                                cfg.isd, (bs, h, w, cfg.data.in_channels),
                                cfg.optim.max_iterations)
    # --train_encoder/--train_decoder: frozen halves get zero updates
    # (pretrain_2D.py:71-72 + unetWithArgs.py:326-343; see train/freeze.py)
    tx = freeze.apply_freeze(tx, state.params, cfg.isd.train_encoder,
                             cfg.isd.train_decoder)
    state = state._replace(opt_state=tx.init(state.params))
    # crash resume: iter_<N> pretrain checkpoints carry the FULL
    # PretrainState (params, EMA, queues, optimizer, PRNG), so a restart
    # continues exactly where it stopped — elasticity the reference's
    # stage-1 lacks (SURVEY §5 failure-detection row).
    own = ckpt.latest_step(snapshot_path)
    if own:
        logging.info("resuming pretrain state from iter_%d", own)
        state = ckpt.restore_state(snapshot_path, own, state)

    # local ImageNet-pretrained backbone for stage 1 (the reference loads
    # pretrained weights at model construction, e.g. ViT_Seg load_from).
    # Skipped on resume: the resumed state already trained FROM the
    # pretrained init, overwriting it would discard that progress.
    if cfg.pretrained_path and not own:
        from arco_tpu.compat.pretrained import load_pretrained
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((1, h, w, cfg.data.in_channels)), train=False)
        mp, ms = load_pretrained(cfg.model, cfg.pretrained_path,
                                 variables["params"],
                                 variables.get("batch_stats"))
        state = state._replace(
            params={**state.params, "model": mp},
            ema_params={**state.ema_params, "model": mp},
            batch_stats={**state.batch_stats, "model": ms}
            if ms else state.batch_stats,
            ema_batch_stats={**state.ema_batch_stats, "model": ms}
            if ms else state.ema_batch_stats,
            opt_state=tx.init({**state.params, "model": mp}))
        logging.info("loaded pretrained backbone from %s",
                     cfg.pretrained_path)
    step_fn = make_pretrain_step(modules, cfg.isd, tx, labeled_bs,
                                 num_classes)

    labeled_slice = patients_to_slices(cfg.exp, cfg.data.labeled_num)
    dataset = SliceDataset(cfg.data.root_path, "train",
                           output_size=cfg.data.patch_size)
    sampler = TwoStreamBatchSampler(
        list(range(labeled_slice)),
        list(range(labeled_slice, len(dataset))), bs, bs - labeled_bs,
        seed=cfg.seed)
    logger = MetricLogger(snapshot_path)
    host_rng = np.random.RandomState(cfg.seed)

    # weak/strong view combinations (pretrain_2D.py:210-225): 0 = identity,
    # 1 = strong student, 2 = strong teacher, 3 = both; 'strong' is the
    # RandomColorJitter+RandomNoise stack, applied on device
    from arco_tpu.augment.photometric import batch_photometric

    @jax.jit
    def make_views(rng_key, images):
        k_s, k_t = jax.random.split(rng_key)
        stu, tea = images, images
        if cfg.isd.combinations in (1, 3):
            stu = batch_photometric(k_s, images)
        if cfg.isd.combinations in (2, 3):
            tea = batch_photometric(k_t, images)
        return stu, tea

    # device-resident data path (data/device_bank.py): slices staged in
    # HBM, transforms on device; batches bit-identical to the host path
    # for the same host_rng stream
    bank = None
    if cfg.data.device_data:
        from arco_tpu.data.device_bank import DeviceSliceBank
        try:
            bank = DeviceSliceBank.from_dataset(dataset)
            logging.info("device data path: %d slices staged in HBM",
                         len(dataset))
        except ValueError as e:
            logging.info("device data path unavailable (%s); "
                         "using the host pipeline", e)

    view_rng = jax.random.PRNGKey(cfg.seed + 1)
    it = int(state.step)
    t0 = time.time()
    while it < cfg.optim.max_iterations:
        for idxs in sampler:
            if bank is not None:
                images, labels = bank.gather(bank.draw_params(host_rng,
                                                              idxs))
            else:
                samples = [dataset.get(i, host_rng) for i in idxs]
                images = np.stack([s["image"] for s in samples])
                labels = np.stack([s["label"] for s in samples])
            view_rng, k = jax.random.split(view_rng)
            stu, tea = make_views(k, jnp.asarray(images))
            batch = {"student_image": stu, "teacher_image": tea,
                     "label": jnp.asarray(labels)}
            state, metrics = step_fn(state, batch)
            it += 1
            if it % cfg.log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                ips = cfg.log_every * bs / (time.time() - t0)
                t0 = time.time()
                logger.log(it, {**m, "images_per_sec": ips})
                logging.info(
                    "iteration %d : loss : %f, loss_ce: %f, loss_dice: %f, "
                    "loss_latent: %f, loss_output: %f (%.1f img/s)", it,
                    m["loss"], m["loss_ce"], m["loss_dice"],
                    m["loss_latent"], m["loss_output"], ips)
            if it % cfg.ckpt_every == 0:
                ckpt.save_state(snapshot_path, it, state)
            if it >= cfg.optim.max_iterations:
                break
    ckpt.save_state(snapshot_path, int(state.step), state)
    return "Training Finished!"


def main(argv=None):
    base = TrainConfig()
    # the reference pretrain optimizer is plain SGD momentum=0.9 WITHOUT
    # nesterov (pretrain_2D.py:196-197), unlike the ARCO stage
    # (train_arco_2d.py:248); --optim.nesterov still overrides
    base.optim.nesterov = False
    cfg = parse_args(argv, base=base)
    # snapshot suffix encodes the freeze config (pretrain_2D.py:313-320)
    suffix = freeze.snapshot_suffix(cfg.isd.train_encoder,
                                    cfg.isd.train_decoder)
    snapshot_path = os.path.join(
        cfg.snapshot_dir,
        f"{cfg.exp}_{cfg.data.labeled_num}_labeled{suffix}", cfg.model)
    train(cfg, snapshot_path)


if __name__ == "__main__":
    main()
