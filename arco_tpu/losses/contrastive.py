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
                    capacity_bg: int = 50000, dtype=jnp.float32) -> MemoBank:
    caps = tuple([capacity_bg] + [capacity] * (num_classes - 1))
    max_cap = max(caps)
    return MemoBank(
        data=jnp.zeros((num_classes, max_cap, feat), dtype),
        ptr=jnp.zeros((num_classes,), jnp.int32),
        count=jnp.zeros((num_classes,), jnp.int32),
        capacities=caps)


def _bank_enqueue(bank: MemoBank, cls: int, keys: jnp.ndarray, enable):
    """Enqueue [B, feat] keys into class ``cls`` with wraparound at the
    class's own capacity; no-op when ``enable`` is False.

    Implemented with lax.cond so the untaken branch costs nothing — a
    jnp.where over the scattered bank would materialize two full copies of
    the (large) bank array per class per step."""
    cap = bank.capacities[cls]
    b = keys.shape[0]

    def write(operand):
        data, ptr, count = operand
        idx = (ptr[cls] + jnp.arange(b, dtype=jnp.int32)) % cap
        return (data.at[cls, idx].set(keys.astype(data.dtype)),
                ptr.at[cls].set((ptr[cls] + b) % cap),
                count.at[cls].set(jnp.minimum(count[cls] + b, cap)))

    data, ptr, count = jax.lax.cond(
        enable, write, lambda o: o, (bank.data, bank.ptr, bank.count))
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

    # all-class prototypes in ONE pass over the (large) teacher reps:
    # proto_k = sum_n rep_t[n] * low_valid[n, k] / count_k
    low_valid_all = ((label_onehot_all > 0)
                     & (low_mask > 0)[..., None]).reshape(-1, num_classes)
    n_low_all = jnp.sum(low_valid_all.astype(jnp.int32), axis=0)  # [K]
    protos_all = jnp.einsum(
        "nc,nk->kc", rep_t_flat.astype(jnp.float32),
        low_valid_all.astype(jnp.float32),
        precision=jax.lax.Precision.DEFAULT)
    protos_all = protos_all / jnp.maximum(n_low_all, 1)[:, None]

    losses, valids, has_anchor = [], [], []
    new_bank = memobank
    for i in range(num_classes):
        rng, k_anchor, k_neg, k_enq = jax.random.split(rng, 4)
        onehot_i = label_onehot_all[..., i] > 0
        low_valid = onehot_i & (low_mask > 0)
        high_valid = onehot_i & (high_mask > 0)
        prob_i = prob_all[..., i]

        anchor_mask = (prob_i > current_class_threshold) & low_valid
        high_entropy_mask = (prob_i < delta_n) & high_valid

        # class mask (loss_helper_3d.py:384-397): unlabeled pixels whose
        # class-i rank is in [low_rank, high_rank); labeled pixels whose
        # rank < low_rank AND whose label is not class i.
        rank_i = rank_all[..., i]
        cm_u = (rank_i >= low_rank) & (rank_i < high_rank) & (~lab)
        cm_l = (rank_i < low_rank) & (label_l_onehot[..., i] == 0) & lab
        negative_mask = high_entropy_mask & (cm_u | cm_l)

        # class prototype from teacher features over low-valid pixels
        # (precomputed for all classes in one pass above)
        n_low = n_low_all[i]
        proto = protos_all[i]

        # enqueue a stratified sample of this step's negatives, stored
        # L2-NORMALIZED so the loss never has to re-normalize the bank
        # (the reference normalizes raw keys at use time inside
        # cosine_similarity, loss_helper_3d.py:503 — same math)
        neg_flat = negative_mask.reshape(-1)
        enq_idx, n_neg_pix = sampling.sample_from_mask(
            k_enq, neg_flat, enqueue_per_class, func="smc")
        keys = _l2_normalize(rep_t_flat[enq_idx])
        new_bank = _bank_enqueue(new_bank, i, keys, enable=n_neg_pix > 0)

        # anchors (stratified over the valid-pixel sequence)
        anchor_flat = anchor_mask.reshape(-1)
        a_idx, n_anchor = sampling.sample_from_mask(
            k_anchor, anchor_flat, num_queries, func=func)
        anchor_feat = rep_flat[a_idx]

        # negatives from the bank. No random shuffle (a device sort); the
        # transposed reshape deals every query a strided subset of strata,
        # so each row still spans the bank's full rank space like the
        # reference's shuffled draw does.
        bank_count = new_bank.count[i]
        neg_ranks = sampling.draw_indices(
            k_neg, bank_count, num_queries * num_negatives, func=func,
            shuffle=False)
        neg_idx = neg_ranks.reshape(num_negatives, num_queries).T

        if infonce is sampled_infonce:
            loss_i = infonce(anchor_feat, proto, new_bank.data[i], neg_idx,
                             temp, bank_normalized=True)
        else:
            # custom kernels (the Pallas path) contract: bank rows carry no
            # gradient — true here by construction (teacher keys), made
            # explicit so the zero-cotangent VJP is provably correct
            loss_i = infonce(anchor_feat, proto,
                             jax.lax.stop_gradient(new_bank.data[i]),
                             neg_idx, temp)

        valids.append(n_low > 0)
        has_anchor.append((n_anchor > 0) & (bank_count > 0))
        losses.append(loss_i)

    losses = jnp.stack(losses)
    valid_v = jnp.stack(valids)
    contrib = jnp.stack(has_anchor) & valid_v
    valid_seg = jnp.sum(valid_v.astype(jnp.float32))
    total = jnp.sum(losses * contrib.astype(jnp.float32))
    # <2 valid classes -> 0 (loss_helper_3d.py:417-425)
    reco = jnp.where(valid_seg > 1, total / jnp.maximum(valid_seg, 1.0), 0.0)
    return new_bank, reco


def descending_rank(prob: jnp.ndarray) -> jnp.ndarray:
    """rank_all[..., i] = position of class i in the descending sort of the
    class axis (torch.sort(prob, 1, True) parity incl. stable tie order)."""
    order = jnp.argsort(-prob, axis=-1, stable=True)
    return jnp.argsort(order, axis=-1).astype(jnp.int32)
