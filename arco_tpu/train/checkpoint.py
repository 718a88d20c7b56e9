"""Checkpointing with orbax: the ENTIRE train state is saved — params, EMA
params, optimizer state, queues/memory banks with their pointers, and the
PRNG key — enabling bit-deterministic resume.

The reference saves only model.state_dict() every 1000 iterations
(train_arco_2d.py:462-470) and silently loses optimizer/EMA/queue state on
restart (SURVEY §5 failure-detection row); this module fixes that while also
writing a reference-style `iter_<N>` directory layout so the two-stage
handoff (--resume, train_arco_2d.py:223-226) works the same way.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _path(snapshot_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(snapshot_dir), f"iter_{step}")


def save_state(snapshot_dir: str, step: int, state: Any):
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(_path(snapshot_dir, step), state, force=True)
    ckpt.wait_until_finished()


def save_model_state(snapshot_dir: str, step: int, state: Any):
    """Reference-parity lightweight checkpoint in the iter_<N> layout,
    restorable by `load_model_params` and the eval sweeps: the full
    weight-level state (student params incl. fusion heads, BN stats, EMA
    copies, teacher feature extractor) but NOT the optimizer or the
    GB-scale memory banks.

    The ARCO random pool alone is ~GB-scale, so writing the FULL state at
    the reference's every-1000-iteration cadence (train_arco_2d.py:462-470)
    would cost tens of GB per run; these ~20 MB weight checkpoints mirror
    the reference's .pth files while `save_full_state` keeps a rolling
    resume state (optimizer/queues/PRNG)."""
    tree = {"params": state.params,
            "batch_stats": state.batch_stats,
            "ema_params": state.ema_params,
            "ema_batch_stats": state.ema_batch_stats}
    if hasattr(state, "k_feature_params"):
        tree["k_feature_params"] = state.k_feature_params
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(_path(snapshot_dir, step), tree, force=True)
    ckpt.wait_until_finished()


def restore_model_fallback(snapshot_dir: str, step: int, state: Any,
                           tx=None) -> Any:
    """Degraded resume from an iter_<N> weight checkpoint when no
    full_iter resume state exists: weights/EMA/BN restored, step set, and
    the optimizer re-initialized with its LR-schedule count fast-forwarded
    to ``step`` (poly decay must continue, not restart). Optimizer
    momentum, memory banks, and the PRNG stream start fresh — a small
    transient (banks refill in ~200 steps)."""
    import jax.numpy as jnp
    ckpt = ocp.StandardCheckpointer()
    restored = ckpt.restore(_path(snapshot_dir, step))  # raw tree
    updates = {}
    for key in ("params", "batch_stats", "ema_params", "ema_batch_stats",
                "k_feature_params"):
        if key in restored and hasattr(state, key):
            cur = getattr(state, key)
            if isinstance(cur, dict) and isinstance(restored[key], dict):
                # shallow merge: older model-only checkpoints carry just the
                # "model" subtree; fresh head params fill the rest
                updates[key] = {**cur, **restored[key]}
            else:
                updates[key] = restored[key]
    updates["step"] = jnp.asarray(step, jnp.int32)
    if tx is not None:
        from arco_tpu.train.schedule import fast_forward_opt_state
        updates["opt_state"] = fast_forward_opt_state(
            tx.init(updates.get("params", state.params)), step)
    return state._replace(**updates)


def _full_path(snapshot_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(snapshot_dir), f"full_iter_{step}")


# Device memory banks excluded from resume checkpoints by default: the
# random pool alone is GB-scale and bulk D2H over the tunneled backend is
# pathologically slow (an iter-5000 full save stalled >15 min with no
# bytes landing), while both banks refill from live teacher keys within
# ~200 steps of resume — a negligible transient next to losing the
# optimizer/EMA/PRNG state. Pass exclude=() for a complete-state save.
RESUME_EXCLUDE = ("memobank", "random_pool", "random_pool_ptr")


def save_full_state(snapshot_dir: str, step: int, state: Any, keep: int = 2,
                    exclude=RESUME_EXCLUDE):
    """Rolling resume checkpoint (params, EMA, optimizer, queues, PRNG —
    minus ``exclude``, see RESUME_EXCLUDE) under full_iter_<N>; prunes all
    but the newest ``keep``."""
    import shutil
    tree = state._asdict() if hasattr(state, "_asdict") else dict(state)
    tree = {k: v for k, v in tree.items() if k not in exclude}
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(_full_path(snapshot_dir, step), tree, force=True)
    ckpt.wait_until_finished()
    steps = sorted(_scan_steps(snapshot_dir, "full_iter_"))
    for old in steps[:-keep]:
        shutil.rmtree(_full_path(snapshot_dir, old), ignore_errors=True)


def restore_full_state(snapshot_dir: str, step: int, target: Any,
                       exclude=RESUME_EXCLUDE) -> Any:
    """Inverse of save_full_state: restore the saved fields, keep the
    target's freshly-initialized values for the excluded ones."""
    tree = target._asdict() if hasattr(target, "_asdict") else dict(target)
    saved = {k: v for k, v in tree.items() if k not in exclude}
    kept = {k: v for k, v in tree.items() if k in exclude}
    ckpt = ocp.StandardCheckpointer()
    restored = ckpt.restore(_full_path(snapshot_dir, step), target=saved)
    if hasattr(target, "_asdict"):
        return type(target)(**{**restored, **kept})
    return {**restored, **kept}


def latest_full_step(snapshot_dir: str) -> Optional[int]:
    steps = _scan_steps(snapshot_dir, "full_iter_")
    return max(steps) if steps else None


def _scan_steps(snapshot_dir: str, prefix: str) -> list:
    if not os.path.isdir(snapshot_dir):
        return []
    steps = []
    for name in os.listdir(snapshot_dir):
        if name.startswith(prefix):
            try:
                steps.append(int(name[len(prefix):]))
            except ValueError:
                continue
    return steps


def restore_state(snapshot_dir: str, step: int, target: Any) -> Any:
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(_path(snapshot_dir, step), target=target)


def latest_step(snapshot_dir: str) -> Optional[int]:
    if not os.path.isdir(snapshot_dir):
        return None
    steps = []
    for name in os.listdir(snapshot_dir):
        if name.startswith("iter_"):
            try:
                steps.append(int(name.split("_")[1]))
            except ValueError:
                continue
    return max(steps) if steps else None


def resolve_steps(snapshot_dir: str, iteration: Optional[int],
                  start: Optional[int], end: Optional[int],
                  stride: int) -> list:
    """Checkpoint selection shared by the eval CLIs: either one iteration
    (default latest) or a reference-style sweep over saved iter_<N> dirs
    (test_2D.py:140-157, test_3D.py:39-41)."""
    if iteration is not None and start is not None:
        raise SystemExit(
            "--iteration and --startEpoch are mutually exclusive: pass one "
            "checkpoint or a sweep range, not both")
    if start is not None:
        last = end if end is not None else (latest_step(snapshot_dir)
                                            or start)
        steps = [s for s in range(start, last + 1, stride)
                 if os.path.isdir(_path(snapshot_dir, s))]
        if not steps:
            raise SystemExit(
                f"no checkpoints in [{start}, {last}] under {snapshot_dir}")
        return steps
    step = iteration or latest_step(snapshot_dir)
    if step is None:
        raise SystemExit(f"no checkpoint found under {snapshot_dir}")
    return [step]


def load_model_params(snapshot_dir: str, step: int, params_like: Any,
                      batch_stats_like: Any):
    """Stage-1 -> stage-2 handoff: pull just the backbone params (+BN stats)
    out of a pretrain checkpoint (train_arco_2d.py:223-226 equivalent)."""
    ckpt = ocp.StandardCheckpointer()
    meta = ckpt.metadata(_path(snapshot_dir, step))
    del meta
    # restore the full tree lazily, then index the model subtrees
    restored = ckpt.restore(_path(snapshot_dir, step))
    params = restored["params"]["model"]
    stats = restored["batch_stats"]["model"]
    return params, stats
