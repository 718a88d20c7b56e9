"""Pytree utilities: EMA updates and parameter accounting.

The reference mutates teacher weights in-place inside forward
(model_2D.py:176-184, train_arco_2d.py:306-308, pretrain_2D.py:127-131);
here the EMA is a pure function of two pytrees returned from the train step.
"""

import jax
import jax.numpy as jnp


def ema_update(teacher, student, momentum):
    """teacher <- momentum * teacher + (1 - momentum) * student."""
    return jax.tree_util.tree_map(
        lambda t, s: t * momentum + s.astype(t.dtype) * (1.0 - momentum),
        teacher, student)


def mean_teacher_ema(teacher, student, alpha, global_step):
    """EMA with warmup: alpha = min(1 - 1/(step+1), alpha) (pretrain_2D.py:127)."""
    a = jnp.minimum(1.0 - 1.0 / (global_step + 1.0), alpha)
    return jax.tree_util.tree_map(
        lambda t, s: t * a + s.astype(t.dtype) * (1.0 - a), teacher, student)


def param_count(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree)
