"""Consistency / pseudo-label losses of the ARCO stage.

- compute_unsupervised_loss: confidence-weighted CE on pseudo-labels
  (train_arco_2d.py:482-489)
- revisiting_loss: nearest-neighbor loss against the random pool
  (train_arco_2d.py:126-136)
- equivariance_loss: masked KL between predictions of TPS-warped images and
  TPS-warped predictions (train_arco_2d.py:404-423)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from arco_tpu.losses.supervised import cross_entropy


def compute_unsupervised_loss(predict, target, logits, strong_threshold,
                              conf_mask: bool = False):
    """Confidence-weighted CE (train_arco_2d.py:482-489).

    predict: [B, ..., K] logits; target: [B, ...] int pseudo-labels (-1 =
    void); logits: [B, ...] pseudo-label confidences.
    weighting_b = #(conf >= tau) / #(valid) per sample; loss = mean over
    strictly-positive CE entries of weighting * CE.

    conf_mask=False is the REFERENCE formula: the scalar weight scales CE
    over ALL valid pixels, so low-confidence WRONG pseudo-labels still
    train the student. In noise-dominated regimes that amplifies teacher
    errors through the EMA loop — measured as the sole collapsing term of
    the 3D quality gates (docs/artifacts/quality_gate/
    noisy3d_term_triage.json: removing unsup recovers 0.47->0.77).
    conf_mask=True (beyond-parity, --arco.unsup_conf_mask) restricts the
    CE itself to confident pixels (FixMatch-style), the standard
    mitigation; the per-sample weighting is kept so the term's scale is
    comparable across the switch.
    """
    b = predict.shape[0]
    valid_mask = (target >= 0).astype(jnp.float32)
    strong = (logits.reshape(b, -1) >= strong_threshold).sum(-1)
    weighting = strong / jnp.maximum(valid_mask.reshape(b, -1).sum(-1), 1e-12)
    loss = cross_entropy(predict, target, ignore_index=-1, reduction="none")
    if conf_mask:
        loss = loss * (logits >= strong_threshold).astype(loss.dtype)
    w = weighting.reshape((b,) + (1,) * (loss.ndim - 1))
    pos = (loss > 0).astype(jnp.float32)
    return jnp.sum(w * loss * pos) / jnp.maximum(jnp.sum(pos), 1)


def revisiting_loss(random_pool, rep_u, rep_u_teacher, topk: int = 5):
    """NN 'revisiting' loss (train_arco_2d.py:126-136).

    random_pool: [K, *feat] — pool rows in the representation's NATIVE
    shape (rows L2-normalized over the feature axes);
    rep_u / rep_u_teacher: [B, *feat].
    Squared L2 distance on the unit sphere: d = 2 - 2 <a, b>.
    The student picks its topk nearest pool rows; the loss is the teacher's
    mean distance to those same rows.

    TPU note: the pool is kept in the rep's native (tiled-layout-friendly)
    shape and the feature axes are contracted directly. Flattening the pool
    to [K, 32M] first forces a 2D relayout of multi-GB operands and a
    latency-bound matmul strategy — 46 ms vs ~9 ms for this formulation at
    the reference sizes on TPU v5e. One fused pass serves student and
    teacher queries (the pool HBM read is the roofline).
    """
    from arco_tpu.ops.normalize import feature_axes, l2_normalize

    b = rep_u.shape[0]
    feat_axes = feature_axes(rep_u)
    st = jnp.concatenate([l2_normalize(rep_u, feat_axes),
                          l2_normalize(rep_u_teacher, feat_axes)], axis=0)
    # The term is gradient-free BY REFERENCE SEMANTICS: the student side
    # feeds only topk INDICES (no tangent) and the teacher side is the
    # detached EMA representation (train_arco_2d.py:125-135). Making that
    # explicit matters on TPU: without it the concat+dot+slice chain hides
    # the structurally-zero tangent from JAX, and the transpose pass emits
    # a dead cotangent dot that re-reads the ENTIRE multi-GB pool every
    # step (measured 2.86 GB/step at 2D 256², docs/artifacts/hbm) — and
    # that spurious live read also blocks the in-place pool enqueue.
    st = jax.lax.stop_gradient(st)
    sims = jax.lax.dot_general(
        st, random_pool.astype(st.dtype),
        dimension_numbers=((feat_axes, feat_axes), ((), ())),
        preferred_element_type=jnp.float32)          # [2b, K]
    dist_t = 2.0 - 2.0 * sims[:b]
    dist_q = 2.0 - 2.0 * sims[b:]
    _, nn_index = jax.lax.top_k(-dist_t, topk)
    nn_dist_q = jnp.take_along_axis(dist_q, nn_index, axis=1)
    return jnp.mean(jnp.sum(nn_dist_q, axis=1) / topk)


def equivariance_loss(pred_tps, pred_tps_org, mask_tps):
    """Masked KL equivariance loss (train_arco_2d.py:417-423).

    pred_tps:     [B, ..., K] student logits on warped images
    pred_tps_org: [B, ..., K] warped detached predictions
    mask_tps:     [B, ..., 1] warped validity mask
    KLDivLoss(reduction='none'): q * (log q - log p), per element; masked sum
    per sample normalized by mask sum, then mean over batch.
    """
    logp = jax.nn.log_softmax(pred_tps.astype(jnp.float32), axis=-1)
    q = jax.nn.softmax(pred_tps_org.astype(jnp.float32), axis=-1)
    logq = jnp.log(jnp.clip(q, 1e-30, 1.0))
    kl = q * (logq - logp)                       # [B, ..., K]
    kl = kl * mask_tps.astype(jnp.float32)
    b = kl.shape[0]
    num = kl.reshape(b, -1).sum(1)
    # torch broadcasts the 1-channel mask over K classes inside the product
    # but the denominator uses the raw (1-channel) mask sum
    den = mask_tps.reshape(b, -1).astype(jnp.float32).sum(1) + 1e-7
    return jnp.mean(num / den)
