"""Micro-timing of the TPS warp gather (the eqv leg's non-forward cost,
estimated 22-36 ms in r4): is the 4-corner take_along_axis latency-bound
on short (7-lane) rows, and does padding the channel axis to full lanes
pay for its extra traffic?

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_micro_tps.py
"""

import json
import time

import numpy as np

from arco_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

import jax
import jax.numpy as jnp

from arco_tpu.augment.tps import RandTPS
from arco_tpu.ops.interpolate import grid_sample_2d

B, HW = 8, 256


def timeit(name, fn, *args, steps=30):
    out = fn(*args)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    out.block_until_ready()
    ms = (time.perf_counter() - t0) / steps * 1000
    print(f"{name}: {ms:.2f} ms", flush=True)
    return round(ms, 2)


def main():
    r = np.random.RandomState(0)
    tps = RandTPS(HW, HW, batch_size=B, sigma=0.01)
    grid = tps.reset(jax.random.PRNGKey(0))
    rows = {}
    for c in (1, 7, 32, 128, 496):
        x = jnp.asarray(r.randn(B, HW, HW, c).astype(np.float32)
                        ).astype(jnp.bfloat16)
        fn = jax.jit(lambda xx, gg: grid_sample_2d(xx, gg,
                                                   padding_mode="zeros"))
        rows[f"warp_c{c}"] = timeit(f"warp_c{c}", fn, x, grid)

    # lane-padded variant of the 7-channel case: zero-pad to 128 lanes,
    # warp, slice back
    x7 = jnp.asarray(r.randn(B, HW, HW, 7).astype(np.float32)
                     ).astype(jnp.bfloat16)

    def padded(xx, gg):
        xp = jnp.pad(xx, ((0, 0), (0, 0), (0, 0), (0, 121)))
        return grid_sample_2d(xp, gg, padding_mode="zeros")[..., :7]

    rows["warp_c7_pad128"] = timeit("warp_c7_pad128", jax.jit(padded),
                                    x7, grid)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
