"""Bisect the ARCO step's time by toggling components off one at a time.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bisect_step.py
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from arco_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

from arco_tpu.config import ArcoConfig
from arco_tpu.models import net_factory
from arco_tpu.train.arco2d import (init_arco_state, make_arco_modules,
                                   make_arco_step)
from arco_tpu.train.schedule import make_optimizer

HW, B, K = 256, 4, 4


def run_variant(name, cfg, n=8):
    dtype = jnp.bfloat16
    model = net_factory("unet", in_chns=1, class_num=K, dtype=dtype)
    modules = make_arco_modules(model, HW, HW, batch_size=B, dtype=dtype)
    tx = make_optimizer(0.01, 30000)
    state = init_arco_state(jax.random.PRNGKey(0), modules, cfg,
                            (B, HW, HW, 1), tx)
    step = make_arco_step(modules, cfg, tx, num_classes=K,
                          max_iterations=30000)
    rng = np.random.RandomState(0)
    label = rng.randint(0, K, size=(B, HW, HW)).astype(np.int32)
    image = jnp.asarray(label[..., None].astype(np.float32) / (K - 1))
    batch = {"image_l": image, "label_l": jnp.asarray(label),
             "image_u": image}
    # NOTE: on the tunneled backend block_until_ready does not synchronize;
    # a scalar fetch (float()) is the only reliable fence.
    for _ in range(2):
        state, m = step(state, batch)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, batch)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:28s}: {dt:8.1f} ms/step", flush=True)
    return dt


def main():
    base = ArcoConfig()
    variants = [
        ("full", {}),
        ("no_contrastive", {"compute_contrastive": False}),
        ("no_entropy_split", {"use_entropy_split": False}),
        ("no_revisit", {"compute_revisit": False}),
        ("no_eqv", {"compute_eqv": False}),
        ("no_photometric+morph", {"use_photometric": False,
                                  "use_adv_morph": False}),
        ("minimal", {"compute_contrastive": False, "compute_revisit": False,
                     "compute_eqv": False, "use_photometric": False,
                     "use_adv_morph": False, "compute_unsup": False}),
    ]
    only = sys.argv[1:] or None
    for name, overrides in variants:
        if only and name not in only:
            continue
        cfg = dataclasses.replace(base, **overrides)
        run_variant(name, cfg)


if __name__ == "__main__":
    main()
