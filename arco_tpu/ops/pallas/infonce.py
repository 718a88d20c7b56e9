"""Fused memory-bank InfoNCE as a streaming Pallas TPU kernel.

The reference materializes the gathered negatives
``negative_feat[num_queries*num_negatives, C]`` — 256 MB at the 2D settings
(loss_helper_3d.py:487-496) — then computes cosine similarity row by row.
This kernel never materializes gathered keys at all:

1. XLA side: sampled negative indices [Q, N] are scatter-added into a
   multiplicity matrix ``counts[capacity, Q]`` (a bank key drawn k times
   contributes k*exp(sim) to the softmax denominator — exactly the CE over
   the sampled multiset).
2. Pallas side: the bank streams HBM->VMEM in tiles; each grid step computes
   one tile @ anchors^T block on the MXU and accumulates
   ``denom[q] += sum_k counts[k,q] * exp(sim/T - 1/T)`` on the VPU.
   Cosine similarities are bounded by 1, so the shift 1/T makes every
   exponent <= 0 — numerically stable with no running max.
3. CE = log(exp(pos/T - 1/T) + denom) - (pos/T - 1/T).

Layout note (Mosaic tiling rules): every VMEM block's last two dims must be
(divisible by 8, divisible by 128) OR equal to the full array dims. Keeping
Q and C as the LAST axis of every streamed block (sims [T, Q], counts
[cap, Q], bank [cap, C]) satisfies the rule for any tile that is a multiple
of 8 — the tile only ever appears in the second-to-last position. This is
why counts is built transposed.

HBM traffic: one pass over the bank (+ counts) instead of Q*N scattered row
gathers; compute rides the MXU at one [T, C] x [C, Q] matmul per tile. With
``bank_normalized=True`` (the trainer's contract — keys are L2-normalized at
enqueue, losses/contrastive.py) the kernel streams the bank in its STORED
dtype (bf16 under mixed precision) with no per-step renormalize pass.

Training support: reverse-mode AD cannot flow through ``pallas_call``, so
the loss core carries a custom VJP. The backward pass streams the bank a
second time (``_infonce_grad_kernel``) to form the softmax-weighted key sum
each anchor needs:

    d loss / d a_n[q] = (1/(T*Q)) * [ sum_k w_qk * bank_n[k]
                                      + (sigma_pos_q - 1) * p_n ]
    w_qk = counts[k,q] * exp(s_qk/T - 1/T) / (exp(p_q/T - 1/T) + denom_q)

Gradients are produced for the anchors and the prototype; the BANK (and the
sampled counts) receive ZERO cotangents by design — in the trainer the bank
holds detached teacher keys (loss_helper_3d.py:499 ``.detach()``), so no
gradient may flow there. Callers that need bank gradients must use the XLA
formulation (losses.contrastive.sampled_infonce).
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
        bank_ref[:], anchors_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [T, Q]
    w = counts_ref[:].astype(jnp.float32)
    contrib = w * jnp.exp(sims * inv_temp - inv_temp)
    denom_ref[:] += jnp.sum(contrib, axis=0, keepdims=True)  # [1, Q]


def _infonce_grad_kernel(anchors_ref, bank_ref, counts_ref, invtot_ref,
                         ga_ref, *, inv_temp: float):
    """ga[q] += sum_{k in tile} counts[k,q]*exp(s_kq/T - 1/T)*invtot[q]
    * bank[k] — the softmax-weighted negative-key sum, one MXU matmul per
    bank tile on the way in ([T,C]x[C,Q]) and one on the way out
    ([Q,T]x[T,C], contracted over the tile axis)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        ga_ref[:] = jnp.zeros_like(ga_ref)

    sims = jax.lax.dot_general(
        bank_ref[:], anchors_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [T, Q]
    w = (counts_ref[:].astype(jnp.float32)
         * jnp.exp(sims * inv_temp - inv_temp)
         * invtot_ref[:])                            # [T, Q]
    ga_ref[:] += jax.lax.dot_general(
        w, bank_ref[:].astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [Q, C]


def _counts_matrix(neg_idx: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """Multiplicity of each bank row in each query's sampled negatives,
    TRANSPOSED to [capacity, Q] (see layout note in the module docstring)."""
    q, n = neg_idx.shape
    counts = jnp.zeros((capacity, q), jnp.int32)
    cols = jnp.broadcast_to(jnp.arange(q)[:, None], (q, n))
    return counts.at[neg_idx.reshape(-1), cols.reshape(-1)].add(1)


def _l2n(x, axis=-1, eps=1e-12):
    """f32 accumulation, output keeps the input dtype (bf16 banks stay
    bf16 into the MXU) — matches losses.contrastive._l2_normalize."""
    n2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(n2 + eps)).astype(x.dtype)


def valid_tile(cap: int, requested: int) -> int:
    """Largest tile <= requested that divides ``cap`` and is a multiple of 8
    (Mosaic: second-to-last block dim must be divisible by 8)."""
    if cap <= requested:
        return cap
    for t in range(requested - requested % 8, 7, -8):
        if cap % t == 0:
            return t
    return cap  # no valid divisor: stream the whole bank as one block


def _stream_denom(a_n, bank_n, counts, inv_temp, tile, interpret):
    q, c = a_n.shape
    cap = bank_n.shape[0]
    return pl.pallas_call(
        functools.partial(_infonce_tile_kernel, inv_temp=inv_temp),
        grid=(cap // tile,),
        in_specs=[
            pl.BlockSpec((q, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, q), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, q), jnp.float32),
        interpret=interpret,
    )(a_n, bank_n, counts)


def _stream_grad(a_n, bank_n, counts, invtot, inv_temp, tile, interpret):
    q, c = a_n.shape
    cap = bank_n.shape[0]
    return pl.pallas_call(
        functools.partial(_infonce_grad_kernel, inv_temp=inv_temp),
        grid=(cap // tile,),
        in_specs=[
            pl.BlockSpec((q, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, q), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, c), jnp.float32),
        interpret=interpret,
    )(a_n, bank_n, counts, invtot)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused_ce(a_n, p_n, bank_n, counts, inv_temp, tile, interpret):
    loss, _ = _fused_ce_fwd(a_n, p_n, bank_n, counts, inv_temp, tile,
                            interpret)
    return loss


def _fused_ce_fwd(a_n, p_n, bank_n, counts, inv_temp, tile, interpret):
    denom = _stream_denom(a_n, bank_n, counts, inv_temp, tile,
                          interpret)[0]               # [Q]
    pos_logit = (a_n.astype(jnp.float32)
                 @ p_n.astype(jnp.float32)) * inv_temp  # [Q]
    pos_exp = jnp.exp(pos_logit - inv_temp)
    loss = jnp.mean(jnp.log(pos_exp + denom) + inv_temp - pos_logit)
    return loss, (a_n, p_n, bank_n, counts, denom, pos_exp)


def _fused_ce_bwd(inv_temp, tile, interpret, res, g):
    a_n, p_n, bank_n, counts, denom, pos_exp = res
    q = a_n.shape[0]
    invtot = (1.0 / (pos_exp + denom))[None, :]       # [1, Q]
    ga = _stream_grad(a_n, bank_n, counts, invtot, inv_temp, tile,
                      interpret)                      # [Q, C]
    sigma_pos = (pos_exp * invtot[0])[:, None]        # [Q, 1]
    scale = g * inv_temp / q
    grad_an = scale * (ga + (sigma_pos - 1.0) * p_n[None, :]
                       .astype(jnp.float32))
    grad_pn = scale * jnp.sum((sigma_pos - 1.0) * a_n.astype(jnp.float32),
                              axis=0)
    # bank/counts: detached by contract (see module docstring)
    return (grad_an.astype(a_n.dtype), grad_pn.astype(p_n.dtype),
            jnp.zeros_like(bank_n), jnp.zeros_like(counts))


_fused_ce.defvjp(_fused_ce_fwd, _fused_ce_bwd)


@functools.partial(jax.jit,
                   static_argnames=("temp", "tile", "interpret",
                                    "bank_normalized"))
def pallas_sampled_infonce(anchor, proto, bank_rows, neg_idx,
                           temp: float = 0.5, tile: int = 1024,
                           interpret: bool = False,
                           bank_normalized: bool = False):
    """Drop-in replacement for losses.contrastive.sampled_infonce.

    anchor [Q, C], proto [C], bank_rows [cap, C], neg_idx [Q, N] int32.
    Returns the mean CE with the positive at index 0. Differentiable w.r.t.
    anchor and proto (normalization chain in plain JAX, bank streaming via
    the custom VJP above); the bank receives no gradient.

    ``bank_normalized=True`` skips the per-step L2 pass over the (large)
    bank and streams it in its stored dtype — the trainer's banks hold keys
    normalized at enqueue time (losses/contrastive.py), so this is exact.
    """
    cap = bank_rows.shape[0]
    tile = valid_tile(cap, tile)

    a_n = _l2n(anchor)
    p_n = _l2n(proto[None, :])[0]
    bank_n = bank_rows if bank_normalized else _l2n(bank_rows)
    # float32 counts: custom_vjp cotangents for integer operands are float0,
    # which pallas residual plumbing has no use for — cast once here instead
    counts = _counts_matrix(neg_idx, cap).astype(jnp.float32)
    return _fused_ce(a_n, p_n, bank_n, counts, 1.0 / temp, tile, interpret)


def make_infonce_fn(use_pallas: bool = True, tile: int = 1024,
                    interpret: bool = False, bank_normalized: bool = False):
    """Factory handing compute_contra_memobank_loss its kernel."""
    if not use_pallas:
        from arco_tpu.losses.contrastive import sampled_infonce
        return sampled_infonce

    def fn(anchor, proto, bank_rows, neg_idx, temp):
        return pallas_sampled_infonce(anchor, proto, bank_rows, neg_idx,
                                      temp=temp, tile=tile,
                                      interpret=interpret,
                                      bank_normalized=bank_normalized)
    return fn
