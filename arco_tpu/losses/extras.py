"""Secondary loss library: ReCo baseline, OHEM CE, SoftDice, SupCon family.

Parity targets (rank-generic, static shapes):
- compute_reco_loss (loss_helper_3d.py:516-596): regional contrastive
  baseline — class prototypes, hard-query sampling, negatives drawn across
  classes proportionally to softmax(prototype similarity / temp).
- OhemCrossEntropy2d (loss_helper_3d.py:721-807): online hard example
  mining CE with a min_kept floor.
- SoftDiceLoss (loss_helper_3d.py:931-988).
- SupConLoss (loss_helper_3d.py:1121-1192, Khosla et al. supervised
  contrastive), LocalConLoss (strided variant, :1194-1269).
- weighted_mse_loss (loss_helper_3d.py:904-907).
- InfoNCE (loss_helper.py:27-60).

The reference's dynamic boolean gathers become masked static-shape ops; the
cross-class negative draw uses an inverse-CDF over per-pixel weights instead
of the per-draw Python loop of negative_index_sampler
(loss_helper_3d.py:598-606).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from arco_tpu.ops import sampling


def _l2n(x, axis=-1, eps=1e-12):
    n2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True)
    return x.astype(jnp.float32) * jax.lax.rsqrt(n2 + eps)


def info_nce(query, positive_key, temperature: float = 0.1):
    """InfoNCE with in-batch negatives (loss_helper.py:27-60)."""
    q = _l2n(query)
    k = _l2n(positive_key)
    logits = q @ k.T / temperature
    labels = jnp.arange(q.shape[0])
    logp = jax.nn.log_softmax(logits, axis=1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def compute_reco_loss(rng, rep, valid_mask, prob, label_onehot,
                      strong_threshold: float = 1.0, temp: float = 0.5,
                      num_queries: int = 256, num_negatives: int = 256):
    """ReCo regional contrastive loss, static shapes.

    rep:          [B, *S, C] representations
    valid_mask:   [B, *S] pixel validity
    prob:         [B, *S, K] predicted probabilities
    label_onehot: [B, *S, K]
    """
    num_classes = label_onehot.shape[-1]
    c = rep.shape[-1]
    rep_flat = rep.reshape(-1, c)
    valid = (label_onehot > 0) & (valid_mask[..., None] > 0)
    valid_flat = valid.reshape(-1, num_classes)
    counts = jnp.sum(valid_flat.astype(jnp.int32), axis=0)          # [K]

    protos = jnp.einsum("nc,nk->kc", rep_flat.astype(jnp.float32),
                        valid_flat.astype(jnp.float32))
    protos = protos / jnp.maximum(counts, 1)[:, None]
    protos_n = _l2n(protos)

    prob_flat = prob.reshape(-1, num_classes)
    class_valid = counts > 0
    n_valid = jnp.sum(class_valid.astype(jnp.float32))

    total = jnp.zeros((), jnp.float32)
    contrib = jnp.zeros((), jnp.float32)
    for i in range(num_classes):
        rng, k_a, k_c, k_p = jax.random.split(rng, 4)
        hard_mask = ((prob_flat[:, i] < strong_threshold)
                     & valid_flat[:, i]).reshape(-1)
        a_idx, n_hard = sampling.sample_from_mask(k_a, hard_mask, num_queries,
                                                  func="smc")
        anchors = _l2n(rep_flat[a_idx])

        # negative class distribution ~ softmax(proto similarity / temp)
        sim = protos_n @ protos_n[i]
        sim = jnp.where(class_valid & (jnp.arange(num_classes) != i), sim,
                        -jnp.inf)
        class_prob = jax.nn.softmax(sim / temp)

        # per-pixel negative weight: class_prob[k]/count[k] for valid pixels
        # of other classes -> inverse-CDF draw of Q*N pixel indices
        w_per_class = jnp.where(class_valid, class_prob
                                / jnp.maximum(counts, 1), 0.0)
        w_per_class = w_per_class.at[i].set(0.0)
        pixel_w = valid_flat.astype(jnp.float32) @ w_per_class
        cdf = jnp.cumsum(pixel_w)
        tot = cdf[-1]
        u = jax.random.uniform(k_p, (num_queries * num_negatives,)) \
            * jnp.maximum(tot, 1e-12)
        neg_idx = jnp.searchsorted(cdf, u).clip(0, pixel_w.shape[0] - 1)
        negatives = _l2n(rep_flat[neg_idx]).reshape(num_queries,
                                                    num_negatives, c)

        pos_logit = anchors @ protos_n[i] / temp
        neg_logits = jnp.einsum("qc,qnc->qn", anchors, negatives) / temp
        logits = jnp.concatenate([pos_logit[:, None], neg_logits], axis=1)
        ce = jax.nn.logsumexp(logits, axis=1) - pos_logit

        ok = (class_valid[i] & (n_hard > 0) & (tot > 0)).astype(jnp.float32)
        total = total + jnp.mean(ce) * ok
        contrib = contrib + 0  # denominator is n_valid (reference :596)
    return jnp.where(n_valid > 1, total / jnp.maximum(n_valid, 1.0), 0.0)


def ohem_cross_entropy(logits, labels, ignore_index: int = 255,
                       thresh: float = 0.7, min_kept: int = 100000):
    """OHEM CE (OhemCrossEntropy2dTensor, loss_helper_3d.py:809-890):
    keep pixels whose target-class prob < dynamic threshold; the threshold
    is raised so at least min_kept pixels are kept."""
    k = logits.shape[-1]
    valid = labels != ignore_index
    safe = jnp.clip(labels, 0, k - 1)
    prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    tgt_prob = jnp.take_along_axis(prob, safe[..., None], axis=-1)[..., 0]
    tgt_prob = jnp.where(valid, tgt_prob, jnp.inf)

    flat = tgt_prob.reshape(-1)
    n = flat.shape[0]
    kept = min(min_kept, n)
    kth = -jax.lax.top_k(-flat, kept)[0][-1] if kept > 0 else 0.0
    threshold = jnp.maximum(kth, thresh)
    keep = (tgt_prob <= threshold) & valid

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = nll * keep
    return jnp.sum(nll) / jnp.maximum(jnp.sum(keep), 1)


def soft_dice_loss(logits, target_onehot, smooth: float = 1.0,
                   do_bg: bool = True, batch_dice: bool = False):
    """SoftDiceLoss (loss_helper_3d.py:931-988): -mean dice over classes."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    if not do_bg:
        probs = probs[..., 1:]
        target_onehot = target_onehot[..., 1:]
    axes = tuple(range(0 if batch_dice else 1, probs.ndim - 1))
    intersect = jnp.sum(probs * target_onehot, axis=axes)
    denom = jnp.sum(probs, axis=axes) + jnp.sum(target_onehot, axis=axes)
    dice = (2.0 * intersect + smooth) / (denom + smooth)
    return -jnp.mean(dice)


def sup_con_loss(features, labels=None, temperature: float = 0.07,
                 base_temperature: float = 0.07, contrast_mode: str = "all"):
    """Supervised contrastive loss (Khosla et al.; loss_helper_3d.py:1121).

    features: [B, n_views, C] (L2-normalized inside); labels: [B] or None
    (None -> SimCLR: positives are other views of the same sample)."""
    b, v, c = features.shape
    # view-major stacking (torch.cat(torch.unbind(features, 1)) order):
    # row index = view * B + sample, consistent with the tiled mask blocks
    feats = _l2n(features).transpose(1, 0, 2).reshape(v * b, c)
    if labels is None:
        mask = jnp.eye(b)
    else:
        labels = labels.reshape(b, 1)
        mask = (labels == labels.T).astype(jnp.float32)
    mask = jnp.tile(mask, (v, v))                     # [VB, VB]

    anchor = feats if contrast_mode == "all" else feats[:b]
    logits = anchor @ feats.T / temperature
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=1,
                                                    keepdims=True))
    n = anchor.shape[0]
    self_mask = 1.0 - jnp.eye(b * v)[:n]
    mask = mask[:n] * self_mask
    exp_logits = jnp.exp(logits) * self_mask
    log_prob = logits - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True)
                                + 1e-12)
    denom = jnp.maximum(jnp.sum(mask, axis=1), 1e-12)
    mean_log_prob_pos = jnp.sum(mask * log_prob, axis=1) / denom
    loss = -(temperature / base_temperature) * mean_log_prob_pos
    return jnp.mean(loss)


def local_con_loss(features, labels, temperature: float = 0.7,
                   stride: int = 4):
    """LocalConLoss (loss_helper_3d.py:1194-1269): subsample the spatial grid
    by ``stride`` then apply pixel-wise supervised contrast.

    features: [B, n_views, C, *S]; labels: [B, *S]."""
    sl = (slice(None),) * 3 + tuple(
        slice(None, None, stride) for _ in features.shape[3:])
    f = features[sl]
    l_sl = (slice(None),) + tuple(slice(None, None, stride)
                                  for _ in labels.shape[1:])
    l = labels[l_sl]
    b, v, c = f.shape[:3]
    # fold pixels into the batch: each (sample, pixel) is one instance
    f = f.reshape(b, v, c, -1).transpose(0, 3, 1, 2).reshape(-1, v, c)
    l = l.reshape(-1)
    return sup_con_loss(f, l, temperature=temperature,
                        base_temperature=temperature)


def weighted_mse_loss(input, target, weight):
    """loss_helper_3d.py:904-907."""
    return jnp.sum(weight * (input - target) ** 2)


def criterion(preds, target, aux_weight: float = 0.0,
              ignore_index: int = 255):
    """Criterion (loss_helper_3d.py:616-679): CE on the main head plus
    weighted CE on an optional aux head. preds is logits or an
    (main, aux) tuple."""
    from arco_tpu.losses.supervised import cross_entropy
    if isinstance(preds, (tuple, list)) and aux_weight > 0:
        main, aux = preds[0], preds[1]
        return (cross_entropy(main, target, ignore_index=ignore_index)
                + aux_weight * cross_entropy(aux, target,
                                             ignore_index=ignore_index))
    main = preds[0] if isinstance(preds, (tuple, list)) else preds
    return cross_entropy(main, target, ignore_index=ignore_index)


def criterion_ohem(preds, target, aux_weight: float = 0.0,
                   thresh: float = 0.7, min_kept: int = 100000,
                   ignore_index: int = 255):
    """CriterionOhem (loss_helper_3d.py:681-719)."""
    if isinstance(preds, (tuple, list)) and aux_weight > 0:
        main, aux = preds[0], preds[1]
        return (ohem_cross_entropy(main, target, ignore_index, thresh,
                                   min_kept)
                + aux_weight * ohem_cross_entropy(aux, target, ignore_index,
                                                  thresh, min_kept))
    main = preds[0] if isinstance(preds, (tuple, list)) else preds
    return ohem_cross_entropy(main, target, ignore_index, thresh, min_kept)


def sup_con_seg_loss(features, labels, rng, temperature: float = 0.7,
                     num_samples: int = 256):
    """SupConSegLoss (loss_helper_3d.py:1035-1119): pixel-level supervised
    contrast within a batch. The reference loops over every pixel pair on
    a downsampled map; here ``num_samples`` pixels are drawn per image and
    contrasted jointly (static shapes).

    features: [B, *S, C]; labels: [B, *S] int.
    """
    b = features.shape[0]
    c = features.shape[-1]
    f = features.reshape(b, -1, c)
    l = labels.reshape(b, -1)
    m = f.shape[1]
    idx = jax.random.randint(rng, (b, num_samples), 0, m)
    fs = jnp.take_along_axis(f, idx[..., None], axis=1).reshape(-1, c)
    ls = jnp.take_along_axis(l, idx, axis=1).reshape(-1)
    fs = _l2n(fs)
    logits = fs @ fs.T / temperature
    logits = logits - jax.lax.stop_gradient(
        jnp.max(logits, axis=1, keepdims=True))
    n = fs.shape[0]
    same = (ls[:, None] == ls[None, :]) & (ls[:, None] >= 0)
    not_self = ~jnp.eye(n, dtype=bool)
    pos_mask = (same & not_self).astype(jnp.float32)
    exp_logits = jnp.exp(logits) * not_self
    log_prob = logits - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True)
                                + 1e-12)
    denom = jnp.maximum(jnp.sum(pos_mask, axis=1), 1e-12)
    mean_log_prob = jnp.sum(pos_mask * log_prob, axis=1) / denom
    valid = jnp.sum(pos_mask, axis=1) > 0
    return -jnp.sum(mean_log_prob * valid) / jnp.maximum(jnp.sum(valid), 1)
