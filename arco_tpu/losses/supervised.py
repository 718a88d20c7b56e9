"""Supervised losses (reference: code/utils/losses.py, pretrain_2D.py:99).

Channels-last: logits are [..., num_classes], labels are integer [...].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class DiceLossState:
    """Placeholder to keep the import surface tidy; dice_loss is functional."""


def one_hot(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """One-hot over the trailing axis; negative labels produce all-zero rows
    (the reference relu-clamps then masks, train_arco_2d.py:492-498)."""
    return jax.nn.one_hot(jnp.maximum(labels, 0), num_classes) * (
        labels >= 0)[..., None]


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  ignore_index: int = -1, reduction: str = "mean"):
    """torch F.cross_entropy parity with ignore_index.

    logits [..., K], labels [...] int. reduction 'mean' averages over
    non-ignored elements (torch semantics).
    """
    valid = labels != ignore_index
    safe = jnp.maximum(labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = nll * valid
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def dice_loss(probs: jnp.ndarray, labels: jnp.ndarray, num_classes: int,
              weight=None, smooth: float = 1e-5):
    """Reference DiceLoss (utils/losses.py:173-209): per-class soft dice with
    *global* (whole-batch) sums, averaged over classes.

    probs: softmax probabilities [..., K]; labels: int [...].
    """
    target = one_hot(labels, num_classes)
    probs = probs.astype(jnp.float32)
    axes = tuple(range(probs.ndim - 1))
    intersect = jnp.sum(probs * target, axis=axes)
    y_sum = jnp.sum(target * target, axis=axes)
    z_sum = jnp.sum(probs * probs, axis=axes)
    dice = (2.0 * intersect + smooth) / (z_sum + y_sum + smooth)
    loss = 1.0 - dice
    if weight is not None:
        loss = loss * jnp.asarray(weight)
    return jnp.mean(loss)


def kld_batchmean(student_logits: jnp.ndarray, teacher_logits: jnp.ndarray):
    """KLD(log_softmax(student) || softmax(teacher)), reduction='batchmean'
    (pretrain_2D.py:99-103): sum over classes, divided by batch size."""
    logp = jax.nn.log_softmax(student_logits.astype(jnp.float32), axis=-1)
    q = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=-1)
    logq = jax.nn.log_softmax(teacher_logits.astype(jnp.float32), axis=-1)
    kl = jnp.sum(q * (logq - logp))
    return kl / student_logits.shape[0]


def softmax_mse_loss(input_logits, target_logits):
    """utils/losses.py:85-100 (sum-reduced MSE / num_classes semantics vary;
    here the commonly used elementwise mean)."""
    p = jax.nn.softmax(input_logits.astype(jnp.float32), axis=-1)
    q = jax.nn.softmax(target_logits.astype(jnp.float32), axis=-1)
    return jnp.mean((p - q) ** 2)


def softmax_kl_loss(input_logits, target_logits):
    """utils/losses.py:104-121."""
    logp = jax.nn.log_softmax(input_logits.astype(jnp.float32), axis=-1)
    q = jax.nn.softmax(target_logits.astype(jnp.float32), axis=-1)
    logq = jax.nn.log_softmax(target_logits.astype(jnp.float32), axis=-1)
    return jnp.mean(jnp.sum(q * (logq - logp), axis=-1))


def symmetric_mse_loss(input1, input2):
    """utils/losses.py:125-133: gradients flow to BOTH inputs (unlike
    softmax_mse where the target is detached); mean squared difference."""
    return jnp.mean((input1 - input2) ** 2)


def entropy_loss(probs, eps: float = 1e-6):
    """Mean pixel entropy (utils/losses.py:7-14)."""
    ent = -jnp.sum(probs * jnp.log(probs + eps), axis=-1)
    return jnp.mean(ent)


def focal_loss(logits, labels, gamma: float = 2.0, alpha: float = 0.25,
               ignore_index: int = -1):
    """utils/losses.py:136-170."""
    valid = labels != ignore_index
    safe = jnp.maximum(labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    logpt = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    pt = jnp.exp(logpt)
    loss = -alpha * (1 - pt) ** gamma * logpt * valid
    return jnp.sum(loss) / jnp.maximum(jnp.sum(valid), 1)
