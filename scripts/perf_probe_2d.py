"""Per-subsystem wall-clock attribution of the 2D ARCO step (VERDICT r4
item 5): the HBM analyzer models TRAFFIC, but at 52% of peak achieved
bandwidth the step may be latency-bound — this probe measures what each
subsystem actually COSTS by timing config variants on the real chip.

Variants (cumulative-independent, each vs base):
  base         — full reference config (the bench configuration)
  norevisit    — compute_revisit=False (removes the pool read + enqueue:
                 ~8 GB/step modeled; if the step barely speeds up, the
                 pool DUS is already in-place and the modeled 5.2 GB is
                 an analyzer artifact of bytes_accessed counting)
  noeqv        — compute_eqv=False (the TPS warp + 6th forward leg)
  nocontra     — compute_contrastive=False (memobank + sampling + infonce)
  nounsup      — compute_unsup=False
  suponly      — everything off (floor: 2 student + 2 teacher forwards)

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe_2d.py \
        --out docs/artifacts/hbm/perf_probe_2d.json
"""

import argparse
import dataclasses
import json
import os
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

HW, BATCH, K = 256, 4, 4

VARIANTS = {
    "base": {},
    "norevisit": dict(compute_revisit=False),
    "noeqv": dict(compute_eqv=False, use_eqv_loss=False),
    "nocontra": dict(compute_contrastive=False),
    "nounsup": dict(compute_unsup=False),
    "suponly": dict(compute_revisit=False, compute_eqv=False,
                    use_eqv_loss=False, compute_contrastive=False,
                    compute_unsup=False),
}


def time_variant(name, overrides, steps=20, warmup=3):
    cfg = dataclasses.replace(ArcoConfig(), **overrides)
    if cfg.K % BATCH:
        cfg = dataclasses.replace(cfg, K=(cfg.K // BATCH) * BATCH or BATCH)
    dtype = jnp.bfloat16
    model = net_factory("unet", in_chns=1, class_num=K, dtype=dtype)
    modules = make_arco_modules(model, HW, HW, batch_size=BATCH, dtype=dtype)
    tx = make_optimizer(0.01, 30000)
    state = init_arco_state(jax.random.PRNGKey(0), modules, cfg,
                            (BATCH, HW, HW, 1), tx)
    step_fn = make_arco_step(modules, cfg, tx, num_classes=K,
                             max_iterations=30000)
    rng = np.random.RandomState(0)
    label = rng.randint(0, K, size=(BATCH, HW, HW)).astype(np.int32)
    image = (label[..., None].astype(np.float32) / (K - 1)
             + 0.1 * rng.randn(BATCH, HW, HW, 1).astype(np.float32))
    batch = {"image_l": jnp.asarray(image), "label_l": jnp.asarray(label),
             "image_u": jnp.asarray(image)}
    for _ in range(warmup):
        state, metrics = step_fn(state, batch)
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, batch)
    _ = float(metrics["loss"])
    ms = (time.perf_counter() - t0) / steps * 1000
    print(f"{name}: {ms:.1f} ms/step "
          f"({2 * BATCH / ms * 1000:.1f} img/s)", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--variants", nargs="+", default=sorted(VARIANTS))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    rows = {}
    for name in args.variants:
        rows[name] = round(time_variant(name, VARIANTS[name],
                                        steps=args.steps), 2)
    base = rows.get("base")
    out = {"config": f"2d {HW}^2 bs {BATCH}+{BATCH} bf16",
           "backend": jax.devices()[0].platform,
           "ms_per_step": rows}
    if base:
        out["delta_vs_base_ms"] = {k: round(base - v, 2)
                                   for k, v in rows.items() if k != "base"}
    print(json.dumps(out, indent=1))
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
