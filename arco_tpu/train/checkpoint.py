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
    """Reference-parity lightweight checkpoint: model params + BN stats (+
    the EMA copy, as pretrain saves iter_N_ema.pth) in the same iter_<N>
    layout, restorable by `load_model_params` and the eval sweeps.

    The ARCO random pool alone is ~GB-scale, so writing the FULL state at
    the reference's every-1000-iteration cadence (train_arco_2d.py:462-470)
    would cost tens of GB per run; per-iteration checkpoints carry only the
    model (like the reference's .pth files) while `save_full_state` keeps a
    rolling complete state for crash resume."""
    tree = {"params": {"model": state.params["model"]},
            "batch_stats": {"model": state.batch_stats["model"]},
            "ema_params": {"model": state.ema_params["model"]},
            "ema_batch_stats": {"model": state.ema_batch_stats["model"]}}
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(_path(snapshot_dir, step), tree, force=True)
    ckpt.wait_until_finished()


def _full_path(snapshot_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(snapshot_dir), f"full_iter_{step}")


def save_full_state(snapshot_dir: str, step: int, state: Any, keep: int = 2):
    """Rolling complete-state checkpoint (params, EMA, optimizer, queues,
    memobank, pool, PRNG) under full_iter_<N>; prunes all but the newest
    ``keep`` so long runs don't accumulate GB-scale state dumps."""
    import shutil
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(_full_path(snapshot_dir, step), state, force=True)
    ckpt.wait_until_finished()
    steps = sorted(_scan_steps(snapshot_dir, "full_iter_"))
    for old in steps[:-keep]:
        shutil.rmtree(_full_path(snapshot_dir, old), ignore_errors=True)


def restore_full_state(snapshot_dir: str, step: int, target: Any) -> Any:
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(_full_path(snapshot_dir, step), target=target)


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
