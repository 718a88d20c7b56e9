"""Optimizer and LR schedule matching the reference training recipe.

SGD(lr=0.01, momentum=0.9, nesterov, weight_decay=1e-4) with poly decay
lr = base * (1 - iter/max_iter)^0.9 (train_arco_2d.py:248,433-435).

torch couples weight decay into the gradient before momentum; the optax chain
below reproduces that ordering exactly.
"""

from __future__ import annotations

import optax


def poly_schedule(base_lr: float, max_iterations: int, power: float = 0.9):
    def schedule(step):
        frac = 1.0 - step / max_iterations
        return base_lr * (frac ** power)
    return schedule


def make_optimizer(base_lr: float, max_iterations: int,
                   weight_decay: float = 1e-4, momentum: float = 0.9,
                   nesterov: bool = True, power: float = 0.9):
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(learning_rate=poly_schedule(base_lr, max_iterations, power),
                  momentum=momentum, nesterov=nesterov),
    )


def fast_forward_opt_state(opt_state, step: int):
    """Set every schedule count in a fresh opt_state to ``step`` so the
    poly LR continues from a resumed iteration instead of restarting at
    base_lr (used by the degraded model-checkpoint resume)."""
    import jax
    import jax.numpy as jnp

    def is_sched(s):
        return isinstance(s, optax.ScaleByScheduleState)

    def fix(s):
        if is_sched(s):
            return s._replace(count=jnp.asarray(step, s.count.dtype))
        return s

    return jax.tree_util.tree_map(fix, opt_state, is_leaf=is_sched)
