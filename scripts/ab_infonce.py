"""In-step A/B of the InfoNCE implementations at the REAL bank sizes
(VERDICT r2 item 5): the full ARCO-2D train step (256², bs 2+2, bf16,
memobank 30k/50k, Q=256, N=512) timed with --arco.infonce_impl xla vs
pallas. The north star (BASELINE.json) names a fused Pallas InfoNCE; round
1's claim that the XLA formulation matches it came from a micro-benchmark —
this measures both inside the compiled product step.

    PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/ab_infonce.py
"""

import dataclasses
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

HW, B, K = 256, 2, 4


def bench(impl: str, steps: int = 20) -> dict:
    on_cpu = jax.devices()[0].platform == "cpu"
    hw, b = (48, 2) if on_cpu else (HW, B)
    dtype = jnp.float32 if on_cpu else jnp.bfloat16
    cfg = dataclasses.replace(
        ArcoConfig(), infonce_impl=impl,
        pallas_tile=50 if on_cpu else 2000,
        memobank_size=100 if on_cpu else 30000,
        memobank_size_bg=100 if on_cpu else 50000,
        K=36 - 36 % (2 * b) if 36 % (2 * b) else 36)
    model = net_factory("unet", in_chns=1, class_num=K, dtype=dtype)
    modules = make_arco_modules(model, hw, hw, batch_size=b, dtype=dtype)
    tx = make_optimizer(0.01, 30000)
    state = init_arco_state(jax.random.PRNGKey(0), modules, cfg,
                            (b, hw, hw, 1), tx)
    step_fn = make_arco_step(modules, cfg, tx, num_classes=K,
                             max_iterations=30000)
    rng = np.random.RandomState(0)
    label = rng.randint(0, K, size=(b, hw, hw)).astype(np.int32)
    image = (label[..., None] / (K - 1)
             + 0.1 * rng.randn(b, hw, hw, 1)).astype(np.float32)
    batch = {"image_l": jnp.asarray(image), "label_l": jnp.asarray(label),
             "image_u": jnp.asarray(image)}
    t0 = time.time()
    for _ in range(3):
        state, metrics = step_fn(state, batch)
    _ = float(metrics["loss"])
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, batch)
    loss = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / steps
    return {"impl": impl, "step_ms": round(dt * 1e3, 2),
            "images_per_sec": round(2 * b / dt, 2),
            "reco_loss": round(float(metrics["reco_loss"]), 4),
            "loss": round(loss, 4), "warmup_s": round(compile_s, 1)}


def main():
    rows = [bench("xla"), bench("pallas")]
    for r in rows:
        print(json.dumps(r))
    faster = min(rows, key=lambda r: r["step_ms"])
    print(f"faster in-step: {faster['impl']} "
          f"({rows[0]['step_ms']} vs {rows[1]['step_ms']} ms)")


if __name__ == "__main__":
    main()
