"""Stage-1 ISD pretrain step throughput on the current device.

Reference budget (pretrain_2D.py:33-40): 256² slices, batch 4 total with
labeled_bs 2, 6k iterations. Run on TPU:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_pretrain.py [--3d]

--3d: ISD_3d at the LA budget (pretrain_3D.py:33-41,:165): V-Net
[112,112,80], batch 4 (labeled 2), patch grid 20/10 -> 700 patches.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from arco_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

from arco_tpu.config import ISDConfig
from arco_tpu.models import net_factory
from arco_tpu.train.pretrain import (init_pretrain_state, make_isd_modules,
                                     make_pretrain_step)
from arco_tpu.train.schedule import make_optimizer

HW, B, LB, K = 256, 4, 2, 4


def main(three_d=False):
    import dataclasses
    on_cpu = jax.devices()[0].platform == "cpu"
    dtype = jnp.float32 if on_cpu else jnp.bfloat16

    global K
    if three_d:
        from arco_tpu.models import net_factory_3d
        patch, b, lb, K = (112, 112, 80), 4, 2, 2
        if on_cpu:
            patch, b, lb = (48, 48, 32), 2, 1  # /16 lattice + 20/10 grid
        cfg = dataclasses.replace(ISDConfig(), patch_size=20)
        model = net_factory_3d("vnet", in_chns=1, class_num=K, dtype=dtype)
        shape = (b,) + patch + (1,)
        latent_channels = 256
        shape_str = "x".join(map(str, patch))
    else:
        hw, b, lb = (64, 2, 1) if on_cpu else (HW, B, LB)
        cfg = ISDConfig()
        model = net_factory("unet", in_chns=1, class_num=K, dtype=dtype)
        shape = (b, hw, hw, 1)
        latent_channels = 256
        shape_str = f"{hw}x{hw}"
    if cfg.K % b:
        cfg = dataclasses.replace(cfg, K=(cfg.K // b) * b or b)
    modules = make_isd_modules(model, num_classes=K,
                               latent_feature_size=cfg.latent_feature_size,
                               output_pooling_size=cfg.output_pooling_size,
                               latent_channels=latent_channels, dtype=dtype)
    state = init_pretrain_state(jax.random.PRNGKey(0), modules, cfg,
                                shape, max_iterations=6000)
    tx = make_optimizer(0.01, 6000)
    step_fn = make_pretrain_step(modules, cfg, tx, labeled_bs=lb,
                                 num_classes=K)

    rng = np.random.RandomState(0)
    label = rng.randint(0, K, size=shape[:-1]).astype(np.int32)
    image = jnp.asarray(label[..., None].astype(np.float32) / (K - 1))
    batch = {"student_image": image, "teacher_image": image,
             "label": jnp.asarray(label)}

    for _ in range(2):
        state, metrics = step_fn(state, batch)
    _ = float(metrics["loss"])
    steps = 20
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, batch)
    _ = float(metrics["loss"])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"ISD pretrain step throughput ({shape_str}, bs {b})",
        "value": round(steps * b / dt, 3), "unit": "images/sec/chip",
        "ms_per_step": round(dt / steps * 1000, 1)}))


if __name__ == "__main__":
    import sys
    main(three_d="--3d" in sys.argv)
