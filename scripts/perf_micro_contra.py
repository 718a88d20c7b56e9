"""Micro-timing of the contrastive block's pieces on the real chip — the
block costs 37 ms/step (scripts/perf_probe_2d.py); this locates the ms.

Pieces timed independently (jitted, fenced by scalar fetch):
  rank        — descending_rank on [8,256,256,4]
  percentile  — masked_percentiles (device sort) on [4,256,256]
  percentile_hist — the O(n) histogram variant
  samplers    — the three vmapped sample_from_mask/draw_indices calls
  infonce     — the 4-class vmapped sampled_infonce against full banks
  full        — compute_contra_memobank_loss end to end

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_micro_contra.py
"""

import json
import time

import numpy as np

from arco_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

import jax
import jax.numpy as jnp

from arco_tpu.losses.contrastive import (create_memobank,
                                         compute_contra_memobank_loss,
                                         descending_rank, sampled_infonce)
from arco_tpu.ops import sampling
from arco_tpu.train.arco2d import (masked_percentiles,
                                   masked_percentiles_histogram)

B, HW, K, C = 8, 256, 4, 496
Q, N = 256, 512


def timeit(name, fn, *args, steps=30):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, out)
    ms = (time.perf_counter() - t0) / steps * 1000
    print(f"{name}: {ms:.2f} ms", flush=True)
    return round(ms, 2)


def main():
    r = np.random.RandomState(0)
    prob = jax.nn.softmax(jnp.asarray(
        r.randn(B, HW, HW, K).astype(np.float32)), -1)
    rep = jnp.asarray(r.randn(B, HW, HW, C).astype(np.float32) / 10)
    rep_t = jnp.asarray(r.randn(B, HW, HW, C).astype(np.float32) / 10)
    lab = r.randint(0, K, (B, HW, HW))
    onehot = jnp.asarray(np.eye(K, dtype=np.float32)[lab])
    label_l_padded = jnp.concatenate(
        [onehot[:4], jnp.zeros_like(onehot[4:])], 0)
    low = jnp.asarray((r.rand(B, HW, HW) < 0.5).astype(np.float32))
    high = jnp.asarray((r.rand(B, HW, HW) < 0.5).astype(np.float32))
    entropy = jnp.asarray(r.rand(4, HW, HW).astype(np.float32))
    valid = jnp.asarray((r.rand(4, HW, HW) < 0.9))
    is_labeled = jnp.asarray([True] * 4 + [False] * 4)
    bank = create_memobank(K, C, capacity=30000, capacity_bg=50000,
                           dtype=jnp.float32)
    # fill counts so the infonce matmuls stream realistic bank sizes
    bank = bank._replace(count=jnp.asarray([50000, 30000, 30000, 30000],
                                           jnp.int32))
    rank = descending_rank(prob)
    mask_flat = (onehot > 0).reshape(-1, K).T
    keys4 = jax.random.split(jax.random.PRNGKey(0), K)

    rows = {}
    rows["rank"] = timeit("rank", jax.jit(descending_rank), prob)
    rows["percentile"] = timeit(
        "percentile",
        jax.jit(lambda e, v: masked_percentiles(e, v, [15.0, 85.0])),
        entropy, valid)
    rows["percentile_hist"] = timeit(
        "percentile_hist",
        jax.jit(lambda e, v: masked_percentiles_histogram(
            e, v, [15.0, 85.0])), entropy, valid)
    rows["sampler_anchor"] = timeit(
        "sampler_anchor",
        jax.jit(lambda ks, m: jax.vmap(
            lambda k, mm: sampling.sample_from_mask(k, mm, Q,
                                                    func="asmc"))(ks, m)),
        keys4, mask_flat)
    rows["sampler_negranks"] = timeit(
        "sampler_negranks",
        jax.jit(lambda ks, n: jax.vmap(
            lambda k, nn: sampling.draw_indices(k, nn, Q * N, func="asmc",
                                                shuffle=False))(ks, n)),
        keys4, bank.count)
    anchor_feat = jnp.asarray(r.randn(K, Q, C).astype(np.float32))
    protos = jnp.asarray(r.randn(K, C).astype(np.float32))
    neg_idx = jnp.asarray(
        r.randint(0, 30000, (K, Q, N)).astype(np.int32))
    rows["infonce"] = timeit(
        "infonce",
        jax.jit(lambda a, p, bk, ni: jax.vmap(
            lambda aa, pp, bb, nn: sampled_infonce(
                aa, pp, bb, nn, 0.5, bank_normalized=True))(a, p, bk, ni)),
        anchor_feat, protos, bank.data, neg_idx)
    # args passed positionally — a closure bakes the GB-scale reps into
    # the program as constants (2.5 GB captured, enormous compile)
    full_fn = jax.jit(lambda k, rep_, oh, pr, rk, lab_, lp, lo, hi, rt, bk:
                      compute_contra_memobank_loss(
                          k, rep_, oh, pr, rk, lab_, lp, lo, hi, rt, bk,
                          delta_n=0.97, func="asmc", num_queries=Q,
                          num_negatives=N)[1])
    rows["full"] = timeit("full", full_fn, jax.random.PRNGKey(1), rep,
                          onehot, prob, rank, is_labeled, label_l_padded,
                          low, high, rep_t, bank)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
