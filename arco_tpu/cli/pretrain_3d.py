"""Stage-1 ISD pretraining, 3D LA volumes (reference: pretrain_3D.py).

Shares the rank-generic pretrain step with the 2D path; differences:
V-Net backbone, patch [112,112,80], contrastive patch grid 20/10 (~700
patches, model_3D.py:355-373), output pooling 8 -> descriptors of
num_classes*8^3 features.
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
from arco_tpu.data.samplers import TwoStreamBatchSampler
from arco_tpu.models import net_factory_3d
from arco_tpu.train import checkpoint as ckpt
from arco_tpu.train.pretrain import (init_pretrain_state, make_isd_modules,
                                     make_pretrain_step)
from arco_tpu.train import freeze
from arco_tpu.train.schedule import make_optimizer
from arco_tpu.utils.logging import MetricLogger, log_provenance


def default_3d_config() -> TrainConfig:
    cfg = TrainConfig()
    cfg.data.patch_size = (112, 112, 80)
    cfg.data.num_classes = 2
    cfg.data.labeled_num = 8
    cfg.optim.max_iterations = 6000
    cfg.model = "vnet"
    cfg.isd.patch_size = 20          # pretrain_3D.py:165
    # plain SGD momentum=0.9 without nesterov (pretrain_3D.py:166-167),
    # unlike the ARCO stage
    cfg.optim.nesterov = False
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

    num_classes = cfg.data.num_classes
    patch = tuple(cfg.data.patch_size)
    bs = cfg.data.batch_size
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    model = net_factory_3d(cfg.model, in_chns=cfg.data.in_channels,
                           class_num=num_classes, dtype=dtype)
    modules = make_isd_modules(
        model, num_classes=num_classes,
        latent_feature_size=cfg.isd.latent_feature_size,
        latent_pooling_size=cfg.isd.latent_pooling_size,
        output_pooling_size=cfg.isd.output_pooling_size,
        latent_channels=256, dtype=dtype)
    tx = make_optimizer(cfg.optim.base_lr, cfg.optim.max_iterations,
                        cfg.optim.weight_decay, cfg.optim.momentum,
                        cfg.optim.nesterov, cfg.optim.poly_power)
    state = init_pretrain_state(
        jax.random.PRNGKey(cfg.seed), modules, cfg.isd,
        (bs,) + patch + (cfg.data.in_channels,), cfg.optim.max_iterations)
    # --train_encoder/--train_decoder: frozen halves get zero updates
    # (pretrain_3D.py:73-74; see train/freeze.py)
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
    step_fn = make_pretrain_step(modules, cfg.isd, tx, cfg.data.labeled_bs,
                                 num_classes)

    dataset = LAHeartDataset(cfg.data.root_path, "train", patch_size=patch)
    sampler = TwoStreamBatchSampler(
        list(range(cfg.data.labeled_num)),
        list(range(cfg.data.labeled_num, len(dataset))), bs,
        bs - cfg.data.labeled_bs, seed=cfg.seed)
    logger = MetricLogger(snapshot_path)
    host_rng = np.random.RandomState(cfg.seed)

    # device-resident data path (data/device_bank.py): volumes staged in
    # HBM, crop/rot/flip on device — per-step host->device traffic drops
    # from ~48 MB to ~100 bytes (the tunneled backend leaks every
    # transfer's host buffer; this is what kept OOM-killing stage-1).
    # draw_params consumes host_rng exactly like dataset.get, so the data
    # stream is bit-identical to the host path.
    bank = None
    if cfg.data.device_data:
        from arco_tpu.data.device_bank import DeviceVolumeBank
        try:
            bank = DeviceVolumeBank.from_dataset(dataset, patch)
            logging.info("device data path: %d volumes staged in HBM",
                         len(dataset))
        except ValueError as e:
            logging.info("device data path unavailable (%s); "
                         "using the host pipeline", e)

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
            batch = {"student_image": jnp.asarray(images),
                     "teacher_image": jnp.asarray(images),
                     "label": jnp.asarray(labels)}
            state, metrics = step_fn(state, batch)
            it += 1
            if it % cfg.log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                vps = cfg.log_every * bs / (time.time() - t0)
                t0 = time.time()
                logger.log(it, {**m, "volumes_per_sec": vps})
                logging.info("iteration %d : loss : %f (%.2f vol/s)", it,
                             m["loss"], vps)
            if it % cfg.ckpt_every == 0:
                ckpt.save_state(snapshot_path, it, state)
            if it >= cfg.optim.max_iterations:
                break
    ckpt.save_state(snapshot_path, int(state.step), state)
    return "Training Finished!"


def main(argv=None):
    cfg = parse_args(argv, base=default_3d_config())
    # snapshot suffix encodes the freeze config (pretrain_3D.py:294-301)
    suffix = freeze.snapshot_suffix(cfg.isd.train_encoder,
                                    cfg.isd.train_decoder)
    snapshot_path = os.path.join(
        cfg.snapshot_dir, f"{cfg.exp}_{cfg.data.labeled_num}_labeled{suffix}",
        cfg.model)
    train(cfg, snapshot_path)


if __name__ == "__main__":
    main()
