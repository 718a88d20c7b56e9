"""ARCO 3D train-step throughput (volumes/sec/chip) on the current device.

The 3D path shares the rank-generic step (train/arco2d.py) with the LA
settings: V-Net, patch [112,112,80], fused dim 16, batch 4 (SURVEY §2.1,
train_arco_3d.py:33-41,:148). Run on TPU:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_3d.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from arco_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

from arco_tpu.config import ArcoConfig
from arco_tpu.models import net_factory_3d
from arco_tpu.train.arco2d import (init_arco_state, make_arco_modules,
                                   make_arco_step)
from arco_tpu.train.schedule import make_optimizer

# reference 3D budget: batch 4 TOTAL = 2 labeled + 2 unlabeled
# (train_arco_3d.py:33-35 with labeled_bs=2)
PATCH, B, K = (112, 112, 80), 2, 2


def main(argv=()):
    on_cpu = jax.devices()[0].platform == "cpu"
    patch, b = ((32, 32, 16), 2) if on_cpu else (PATCH, B)
    dtype = jnp.float32 if on_cpu else jnp.bfloat16

    # 3D trainer settings (cli/train_arco_3d.py): eqv excluded from the
    # total, photometric/morph off (augment_3d passthrough), fused dim 16.
    # --no-remat: measure without rematerialized student forwards (viable
    # only if the step still fits HBM); --trainer-parity: the exact trainer
    # config (eqv computed for logging with a stop-grad forward, cutmix).
    import dataclasses
    cfg = ArcoConfig(compute_eqv=False, use_eqv_loss=False,
                     use_photometric=False, use_adv_morph=False,
                     apply_aug="cutout", remat="--no-remat" not in argv)
    if "--trainer-parity" in argv:
        cfg = dataclasses.replace(cfg, compute_eqv=True, apply_aug="cutmix")
    if cfg.K % b:
        cfg = dataclasses.replace(cfg, K=(cfg.K // b) * b or b)
    model = net_factory_3d("vnet", in_chns=1, class_num=K, dtype=dtype)
    modules = make_arco_modules(model, patch[1], patch[0], batch_size=b,
                                feature_channels=(128, 64, 32, 16, 16),
                                fused_dim=16, dtype=dtype)
    tx = make_optimizer(0.01, 6000)
    state = init_arco_state(jax.random.PRNGKey(0), modules, cfg,
                            (b,) + patch + (1,), tx)
    step_fn = make_arco_step(modules, cfg, tx, num_classes=K,
                             max_iterations=6000)

    rng = np.random.RandomState(0)
    label = rng.randint(0, K, size=(b,) + patch).astype(np.int32)
    image = (label[..., None].astype(np.float32)
             + 0.1 * rng.randn(b, *patch, 1).astype(np.float32))
    batch = {"image_l": jnp.asarray(image), "label_l": jnp.asarray(label),
             "image_u": jnp.asarray(image)}

    for _ in range(2):
        state, metrics = step_fn(state, batch)
    _ = float(metrics["loss"])
    steps = 20
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, batch)
    _ = float(metrics["loss"])
    dt = time.perf_counter() - t0
    vols = steps * 2 * b / dt
    print(json.dumps({
        "metric": f"ARCO-3D train step throughput ({patch}, bs {b}+{b})",
        "value": round(vols, 3), "unit": "volumes/sec/chip",
        "ms_per_step": round(dt / steps * 1000, 1),
        "remat": cfg.remat, "eqv_forward": cfg.compute_eqv}))


if __name__ == "__main__":
    import sys
    main(sys.argv[1:])
