"""Fused memory-bank InfoNCE as a streaming Pallas TPU kernel.

The reference materializes the gathered negatives
``negative_feat[num_queries*num_negatives, C]`` — 256 MB at the 2D settings
(loss_helper_3d.py:487-496) — then computes cosine similarity row by row.
This kernel never materializes gathered keys at all:

1. XLA side: sampled negative indices [Q, N] are scatter-added into a
   multiplicity matrix ``counts[Q, capacity]`` (int32; a bank key drawn k
   times contributes k*exp(sim) to the softmax denominator — exactly the CE
   over the sampled multiset).
2. Pallas side: the bank streams HBM->VMEM in tiles; each grid step computes
   one anchors @ tile^T block on the MXU and accumulates
   ``denom[q] += sum_k counts[q,k] * exp(sim/T - 1/T)`` on the VPU.
   Cosine similarities are bounded by 1, so the shift 1/T makes every
   exponent <= 0 — numerically stable with no running max.
3. CE = log(exp(pos/T - 1/T) + denom) - (pos/T - 1/T).

HBM traffic: one pass over the bank (+ counts) instead of Q*N scattered row
gathers; compute rides the MXU at one [Q, C] x [C, T] matmul per tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _infonce_tile_kernel(anchors_ref, bank_ref, counts_ref, denom_ref, *,
                         inv_temp: float):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        denom_ref[:] = jnp.zeros_like(denom_ref)

    sims = jax.lax.dot_general(
        anchors_ref[:], bank_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [Q, T]
    w = counts_ref[:].astype(jnp.float32)
    contrib = w * jnp.exp(sims * inv_temp - inv_temp)
    denom_ref[:] += jnp.sum(contrib, axis=1, keepdims=True)


def _counts_matrix(neg_idx: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """Multiplicity of each bank row in each query's sampled negatives."""
    q, n = neg_idx.shape
    counts = jnp.zeros((q, capacity), jnp.int32)
    rows = jnp.broadcast_to(jnp.arange(q)[:, None], (q, n))
    return counts.at[rows.reshape(-1), neg_idx.reshape(-1)].add(1)


def _l2n(x, axis=-1, eps=1e-12):
    return x / (jnp.linalg.norm(x.astype(jnp.float32), axis=axis,
                                keepdims=True) + eps)


@functools.partial(jax.jit,
                   static_argnames=("temp", "tile", "interpret"))
def pallas_sampled_infonce(anchor, proto, bank_rows, neg_idx,
                           temp: float = 0.5, tile: int = 1024,
                           interpret: bool = False):
    """Drop-in replacement for losses.contrastive.sampled_infonce.

    anchor [Q, C], proto [C], bank_rows [cap, C], neg_idx [Q, N] int32.
    Returns the mean CE with the positive at index 0.
    """
    q, c = anchor.shape
    cap = bank_rows.shape[0]
    assert cap % tile == 0 or cap < tile, (cap, tile)
    tile = min(tile, cap)

    a_n = _l2n(anchor).astype(jnp.float32)
    p_n = _l2n(proto[None, :])[0].astype(jnp.float32)
    bank_n = _l2n(bank_rows).astype(jnp.float32)
    counts = _counts_matrix(neg_idx, cap)

    inv_temp = 1.0 / temp
    grid = (cap // tile,)
    denom = pl.pallas_call(
        functools.partial(_infonce_tile_kernel, inv_temp=inv_temp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((q, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, 1), jnp.float32),
        interpret=interpret,
    )(a_n, bank_n, counts)

    pos_logit = (a_n @ p_n) * inv_temp                  # [Q]
    pos_exp = jnp.exp(pos_logit - inv_temp)
    lse = jnp.log(pos_exp + denom[:, 0]) + inv_temp
    return jnp.mean(lse - pos_logit)


def make_infonce_fn(use_pallas: bool = True, tile: int = 1024,
                    interpret: bool = False):
    """Factory handing compute_contra_memobank_loss its kernel."""
    if not use_pallas:
        from arco_tpu.losses.contrastive import sampled_infonce
        return sampled_infonce

    def fn(anchor, proto, bank_rows, neg_idx, temp):
        return pallas_sampled_infonce(anchor, proto, bank_rows, neg_idx,
                                      temp=temp, tile=tile,
                                      interpret=interpret)
    return fn
