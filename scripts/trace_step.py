"""Capture a jax.profiler trace of the ARCO-2D train step (SURVEY §5
tracing row: the reference has only ad-hoc cuda-event timers,
networks_other.py:203-258).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/trace_step.py [outdir]

View with TensorBoard (`tensorboard --logdir <outdir>`) or the Perfetto
trace in <outdir>/plugins/profile/*/trace.json.gz.
"""

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


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/arco_trace"
    on_cpu = jax.devices()[0].platform == "cpu"
    hw, b = (64, 2) if on_cpu else (HW, B)
    dtype = jnp.float32 if on_cpu else jnp.bfloat16

    cfg = ArcoConfig()
    model = net_factory("unet", in_chns=1, class_num=K, dtype=dtype)
    modules = make_arco_modules(model, hw, hw, batch_size=b, dtype=dtype)
    tx = make_optimizer(0.01, 30000)
    state = init_arco_state(jax.random.PRNGKey(0), modules, cfg,
                            (b, hw, hw, 1), tx)
    step_fn = make_arco_step(modules, cfg, tx, num_classes=K,
                             max_iterations=30000)

    rng = np.random.RandomState(0)
    label = rng.randint(0, K, size=(b, hw, hw)).astype(np.int32)
    image = jnp.asarray(label[..., None].astype(np.float32) / (K - 1))
    batch = {"image_l": image, "label_l": jnp.asarray(label),
             "image_u": image}

    for _ in range(3):  # compile + warm
        state, metrics = step_fn(state, batch)
    _ = float(metrics["loss"])

    with jax.profiler.trace(outdir):
        t0 = time.perf_counter()
        for _ in range(5):
            state, metrics = step_fn(state, batch)
        _ = float(metrics["loss"])
        dt = (time.perf_counter() - t0) / 5
    print(f"traced 5 steps ({dt * 1000:.1f} ms/step) -> {outdir}")


if __name__ == "__main__":
    main()
