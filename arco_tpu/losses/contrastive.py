"""Memory-bank pixel contrastive loss with stratified Monte-Carlo sampling —
the paper's core contribution, rebuilt with static shapes for XLA.

Parity target: compute_contra_memobank_loss (loss_helper_3d.py:271-520 for 2D
tensors; loss_helper.py:442-686 for 3D — one rank-generic implementation here,
fixing the reference's swapped-filename duplication, SURVEY §0).

Reference semantics per class i:
 1. anchors come from pixels that are (a) labeled-or-low-entropy valid,
    (b) teacher prob_i > 0.3 (current_class_threshold),
    sampled by the stratified ('smc') or antithetic ('asmc') sampler;
 2. the positive is the class prototype: masked mean of teacher features
    over the low-entropy valid pixels of class i;
 3. negatives are teacher features of pixels that are high-entropy valid,
    teacher prob_i < delta_n, and whose class-i prob rank lies in
    [low_rank, high_rank) for unlabeled pixels (or rank < low_rank with
    label != i for labeled pixels); they are pushed into a per-class FIFO
    memory bank, and num_queries*num_negatives indices are drawn per step;
 4. loss = CE over cosine similarities (anchor vs [proto; negatives]) / temp,
    averaged over classes with any valid pixel; zero if <2 classes valid.

Static-shape re-design (SURVEY §7.3 hard part #1):
- dynamic boolean-mask gathers -> rank-space stratified sampling
  (arco_tpu.ops.sampling) + gather;
- CPU list-FIFO bank -> pre-allocated [num_classes, capacity, feat] ring
  buffer with per-class pointers/counts; a fixed number of keys
  (cfg.memobank_enqueue) is sampled from each class's negative mask per step
  (the reference enqueues all matching pixels — equivalence is
  distributional: both fill the bank with stratified negative samples);
- `len(...)==0` fallbacks -> validity masks folded into the loss weights;
- the [Q*N, feat] negative gather (256 MB in the reference!) -> blockwise
  gather+einsum over query chunks (see sampled_infonce) or the fused Pallas
  kernel in arco_tpu.ops.pallas.infonce.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from arco_tpu.ops import sampling


class MemoBank(NamedTuple):
    """Per-class negative-key bank. capacities is a static numpy vector —
    class 0 (background) gets a larger bank (train_arco_2d.py:147-154)."""
    data: jnp.ndarray        # [num_classes, max_capacity, feat]
    ptr: jnp.ndarray         # [num_classes] int32
    count: jnp.ndarray       # [num_classes] int32
    capacities: tuple        # static per-class capacity

    @property
    def num_classes(self):
        return self.data.shape[0]


def create_memobank(num_classes: int, feat: int, capacity: int = 30000,
                    capacity_bg: int = 50000, dtype=jnp.float32,
                    init: str = "zeros", init_key=None) -> MemoBank:
    """The reference seeds each class FIFO with ONE init row — zeros in the
    2D trainer (train_arco_2d.py:152), RANDN in the 3D trainer
    (train_arco_3d.py:149) — which serves as every negative until real keys
    arrive. This matters: on 2-class LA the negative mask is provably empty
    for the whole run (rank window [3,20) unreachable; labeled rows need
    onehot_i AND label==0 — contradiction), so the reference's reco there is
    the degenerate-but-nonzero CE against 512 copies of that one random row
    (r4 finding — r3 wrongly believed reco ≡ 0 on LA; the empty-bank skip
    at loss_helper.py:592-595 never fires because shape[0] == 1 > 0).

    The init row sits at slot 0 with ptr=1/count=1: it persists until the
    ring wraps, mirroring the reference FIFO keeping it until overflow.
    Rows are stored L2-normalized (zeros row stays zeros under the eps-
    guarded normalize — cosine 0, exactly torch.cosine_similarity vs 0)."""
    caps = tuple([capacity_bg] + [capacity] * (num_classes - 1))
    max_cap = max(caps)
    data = jnp.zeros((num_classes, max_cap, feat), dtype)
    if init == "randn":
        row = jax.random.normal(
            init_key if init_key is not None else jax.random.PRNGKey(0),
            (num_classes, feat), jnp.float32)
        data = data.at[:, 0].set(_l2_normalize(row).astype(dtype))
    elif init != "zeros":
        raise ValueError(f"unknown memobank init {init!r}")
    return MemoBank(
        data=data,
        ptr=jnp.ones((num_classes,), jnp.int32),
        count=jnp.ones((num_classes,), jnp.int32),
        capacities=caps)


def _bank_enqueue_all(bank: MemoBank, keys: jnp.ndarray, enable):
    """Enqueue [K, B, feat] keys — B per class — in ONE scatter.

    ``enable`` is a [K] bool; a disabled class's writes are routed to an
    out-of-range row index and dropped by the scatter (mode='drop'), so the
    whole update is a single in-place scatter on the donated bank buffer.
    The earlier per-class lax.cond design threaded the full [K, cap, feat]
    array through K sequential conditionals — measured as 4x ~600 MB
    aliased control-flow edges per step (scripts/hbm_traffic.py, r4)."""
    k, b = keys.shape[0], keys.shape[1]
    caps = jnp.asarray(bank.capacities, jnp.int32)           # [K]
    max_cap = bank.data.shape[1]
    slot = (bank.ptr[:, None]
            + jnp.arange(b, dtype=jnp.int32)[None, :]) % caps[:, None]
    slot = jnp.where(enable[:, None], slot, max_cap)         # OOB -> dropped
    cls_idx = jnp.arange(k, dtype=jnp.int32)[:, None]
    data = bank.data.at[cls_idx, slot].set(keys.astype(bank.data.dtype),
                                           mode="drop")
    ptr = jnp.where(enable, (bank.ptr + b) % caps, bank.ptr)
    count = jnp.where(enable, jnp.minimum(bank.count + b, caps), bank.count)
    return bank._replace(data=data, ptr=ptr, count=count)


def _l2_normalize(x, axis=-1, eps=1e-12):
    """Norms accumulate in f32; output keeps the input dtype so bf16 banks
    stay bf16 into the MXU matmul (which accumulates f32)."""
    n2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(n2 + eps)).astype(x.dtype)


def sampled_infonce(anchor, proto, bank_rows, neg_idx, temp: float,
                    bank_normalized: bool = False):
    """CE over cosine similarities without gathering key *vectors* at all.

    anchor:    [Q, C] student anchor features
    proto:     [C] class prototype (positive)
    bank_rows: [cap, C] memory bank for this class
    neg_idx:   [Q, N] int32 indices into bank_rows
    Returns mean CE with the positive at index 0 (loss_helper_3d.py:497-506).

    The reference gathers [Q*N, C] key vectors (256 MB at 2D settings,
    loss_helper_3d.py:487-496). Here ONE MXU matmul computes every
    anchor-bank similarity [Q, cap] in a single pass over the bank, and the
    sampled logits are then a scalar gather [Q, N] from [Q, cap] — the HBM
    traffic drops by ~C (the feature width) and the FLOPs ride the MXU.
    The fully-streaming Pallas variant (no [Q, cap] materialization either)
    lives in arco_tpu.ops.pallas.infonce.
    """
    a_n = _l2_normalize(anchor)
    p_n = _l2_normalize(proto[None, :])[0]
    # when keys were L2-normalized at enqueue time the per-step pass over
    # the (large) bank is skipped entirely
    bank_n = bank_rows if bank_normalized else _l2_normalize(bank_rows)

    pos_logit = jnp.matmul(a_n, p_n,
                           preferred_element_type=jnp.float32) / temp  # [Q]
    sims_full = jnp.matmul(a_n, bank_n.T,
                           preferred_element_type=jnp.float32) / temp
    neg_logits = jnp.take_along_axis(sims_full, neg_idx, axis=1)  # [Q, N]

    all_logits = jnp.concatenate([pos_logit[:, None], neg_logits], axis=1)
    ce = jax.nn.logsumexp(all_logits, axis=1) - pos_logit
    return jnp.mean(ce)


def compute_contra_memobank_loss(
        rng,
        rep,                # [B, *spatial, C] student fused representations
        label_onehot_all,   # [B, *spatial, K] (labeled ++ unlabeled) one-hot
        prob_all,           # [B, *spatial, K] teacher probabilities
        rank_all,           # [B, *spatial, K] int32 descending rank of each class
        is_labeled,         # [B] bool, True for the labeled sub-batch
        label_l_onehot,     # [B, *spatial, K], zeros for unlabeled rows
        low_mask,           # [B, *spatial] low-entropy-or-labeled validity
        high_mask,          # [B, *spatial] high-entropy-or-labeled validity
        rep_teacher,        # [B, *spatial, C] teacher fused representations
        memobank: MemoBank,
        *,
        delta_n: float = 1.0,
        func: str = "smc",
        num_queries: int = 256,
        num_negatives: int = 512,
        temp: float = 0.5,
        low_rank: int = 3,
        high_rank: int = 20,
        current_class_threshold: float = 0.3,
        enqueue_per_class: int = 256,
        infonce_fn=None,
):
    """Returns (new_memobank, reco_loss). See module docstring.

    ``rank_all[..., i]`` must be the 0-based position of class i in the
    descending sort of teacher probabilities (0 = most probable), matching
    torch.sort(prob, 1, True) at loss_helper_3d.py:352-358.
    """
    num_classes = label_onehot_all.shape[-1]
    feat = rep.shape[-1]
    b = rep.shape[0]
    infonce = infonce_fn or sampled_infonce

    rep_flat = rep.reshape(-1, feat)
    rep_t_flat = rep_teacher.reshape(-1, feat)

    lab = is_labeled.reshape((b,) + (1,) * (rep.ndim - 2)).astype(bool)

    # ---- every per-class quantity batched over the class axis (r4: the
    # earlier per-class Python loop issued K sequential bank conditionals
    # + 2K full-rep gathers + K bank matmuls; measured in
    # scripts/hbm_traffic.py as the step's dominant non-model movers) ----

    onehot_all = label_onehot_all > 0                       # [B,*S,K]
    low_valid_all = onehot_all & (low_mask > 0)[..., None]
    high_valid_all = onehot_all & (high_mask > 0)[..., None]
    anchor_mask = (prob_all > current_class_threshold) & low_valid_all
    high_entropy_mask = (prob_all < delta_n) & high_valid_all

    # class mask (loss_helper_3d.py:384-397): unlabeled pixels whose class-i
    # rank is in [low_rank, high_rank); labeled pixels whose rank < low_rank
    # AND whose label is not class i.
    cm_u = ((rank_all >= low_rank) & (rank_all < high_rank)
            & (~lab)[..., None])
    cm_l = (rank_all < low_rank) & (label_l_onehot == 0) & lab[..., None]
    negative_mask = high_entropy_mask & (cm_u | cm_l)       # [B,*S,K]

    # all-class prototypes in ONE pass over the (large) teacher reps:
    # proto_k = sum_n rep_t[n] * low_valid[n, k] / count_k
    low_valid_flat = low_valid_all.reshape(-1, num_classes)
    n_low_all = jnp.sum(low_valid_flat.astype(jnp.int32), axis=0)   # [K]
    # bf16 operands + f32 accumulation: numerically identical to casting
    # the (GB-scale) teacher reps to f32 first — the products are of the
    # same bf16-rounded values either way — but skips materializing the
    # 2x-sized f32 copy in HBM before the contraction
    protos_all = jnp.einsum(
        "nc,nk->kc", rep_t_flat,
        low_valid_flat.astype(rep_t_flat.dtype),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)
    protos_all = protos_all / jnp.maximum(n_low_all, 1)[:, None]

    k_anchor, k_neg, k_enq = jax.random.split(rng, 3)
    ks_anchor = jax.random.split(k_anchor, num_classes)
    ks_neg = jax.random.split(k_neg, num_classes)
    ks_enq = jax.random.split(k_enq, num_classes)

    # enqueue a stratified sample of this step's negatives per class, stored
    # L2-NORMALIZED so the loss never has to re-normalize the bank (the
    # reference normalizes raw keys at use time inside cosine_similarity,
    # loss_helper_3d.py:503 — same math). One batched gather + one scatter.
    neg_flat = negative_mask.reshape(-1, num_classes).T     # [K, M]
    enq_idx, n_neg_pix = jax.vmap(
        lambda k, m: sampling.sample_from_mask(k, m, enqueue_per_class,
                                               func="smc"))(ks_enq, neg_flat)
    keys = _l2_normalize(rep_t_flat[enq_idx])               # [K, enq, C]
    new_bank = _bank_enqueue_all(memobank, keys, enable=n_neg_pix > 0)

    # anchors (stratified over each class's valid-pixel sequence)
    anchor_flat = anchor_mask.reshape(-1, num_classes).T    # [K, M]
    a_idx, n_anchor = jax.vmap(
        lambda k, m: sampling.sample_from_mask(k, m, num_queries,
                                               func=func))(ks_anchor,
                                                           anchor_flat)
    anchor_feat = rep_flat[a_idx]                           # [K, Q, C]

    # negatives from the bank. No random shuffle (a device sort); the
    # transposed reshape deals every query a strided subset of strata, so
    # each row still spans the bank's full rank space like the reference's
    # shuffled draw does.
    bank_count = new_bank.count                             # [K]
    neg_ranks = jax.vmap(
        lambda k, n: sampling.draw_indices(k, n,
                                           num_queries * num_negatives,
                                           func=func,
                                           shuffle=False))(ks_neg, bank_count)
    neg_idx = jnp.swapaxes(
        neg_ranks.reshape(num_classes, num_negatives, num_queries), 1, 2)

    if infonce is sampled_infonce:
        losses = jax.vmap(
            lambda a, p, bk, ni: infonce(a, p, bk, ni, temp,
                                         bank_normalized=True)
        )(anchor_feat, protos_all, new_bank.data, neg_idx)  # [K]
    else:
        # custom kernels (the Pallas path) contract: bank rows carry no
        # gradient — true here by construction (teacher keys), made
        # explicit so the zero-cotangent VJP is provably correct
        bank_sg = jax.lax.stop_gradient(new_bank.data)
        losses = jax.vmap(
            lambda a, p, bk, ni: infonce(a, p, bk, ni, temp)
        )(anchor_feat, protos_all, bank_sg, neg_idx)

    valid_v = n_low_all > 0
    contrib = (n_anchor > 0) & (bank_count > 0) & valid_v
    valid_seg = jnp.sum(valid_v.astype(jnp.float32))
    total = jnp.sum(losses * contrib.astype(jnp.float32))
    # <2 valid classes -> 0 (loss_helper_3d.py:417-425)
    reco = jnp.where(valid_seg > 1, total / jnp.maximum(valid_seg, 1.0), 0.0)
    return new_bank, reco


def descending_rank(prob: jnp.ndarray) -> jnp.ndarray:
    """rank_all[..., i] = position of class i in the descending sort of the
    class axis (torch.sort(prob, 1, True) parity incl. stable tie order).

    For the class counts this loss sees (K <= ~20) the rank is a pairwise
    comparison count: rank_i = #{j : p_j > p_i or (p_j == p_i and j < i)}
    — K^2 elementwise ops instead of TWO full argsorts over the pixel
    volume. On TPU the sorts are bitonic ladders: at 2D 256^2 bs 8 this
    was the contrastive block's dominant cost (scripts/perf_probe_2d.py
    measured the block at 37 ms/step; the argsorts most of it). The
    comparison count reproduces argsort(argsort) EXACTLY including the
    stable tie order (ties broken by ascending index)."""
    k = prob.shape[-1]
    if k <= 32:
        a = prob[..., :, None]          # p_i
        b = prob[..., None, :]          # p_j
        idx = jnp.arange(k, dtype=jnp.int32)
        earlier = idx[None, :] < idx[:, None]   # j < i
        wins = (b > a) | ((b == a) & earlier)
        return jnp.sum(wins.astype(jnp.int32), axis=-1)
    order = jnp.argsort(-prob, axis=-1, stable=True)
    return jnp.argsort(order, axis=-1).astype(jnp.int32)
