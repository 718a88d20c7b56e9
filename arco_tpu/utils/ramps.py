"""Ramp schedules for consistency weights (reference: code/utils/ramps.py).

All functions accept Python or jnp scalars and are jit-safe.
"""

import jax.numpy as jnp


def sigmoid_rampup(current, rampup_length):
    """Exponential rampup from https://arxiv.org/abs/1610.02242 (ramps.py:19)."""
    if rampup_length == 0:
        return 1.0
    phase = 1.0 - jnp.clip(current, 0.0, rampup_length) / rampup_length
    return jnp.exp(-5.0 * phase * phase)


def linear_rampup(current, rampup_length):
    """Linear rampup (ramps.py:29)."""
    if rampup_length == 0:
        return 1.0
    return jnp.clip(current, 0.0, rampup_length) / rampup_length


def cosine_rampdown(current, rampdown_length):
    """Cosine rampdown from https://arxiv.org/abs/1608.03983 (ramps.py:38)."""
    return 0.5 * (jnp.cos(jnp.pi * current / rampdown_length) + 1.0)


def exp_rampup(current, rampup_length):
    """Exponential rampup used by some mean-teacher variants (ramps.py:44)."""
    if rampup_length == 0:
        return 1.0
    return jnp.where(
        current < rampup_length,
        jnp.exp(-5.0 * (1.0 - jnp.clip(current, 0.0, rampup_length)
                        / rampup_length) ** 2),
        1.0,
    )


def cosine_temperature(epoch_num, max_epoch, t_low=0.1, t_high=1.0):
    """Cyclic temperature schedule (pretrain_2D.py:140-143)."""
    return (t_high - t_low) * (1 + jnp.cos(2 * jnp.pi * epoch_num / max_epoch)) / 2 + t_low
