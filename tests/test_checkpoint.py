"""Checkpoint round-trip: the FULL train state (params, EMA, optimizer,
queues, memobank, PRNG) must restore bit-exactly and training must continue
deterministically (SURVEY §5: the reference silently drops everything but
model weights)."""

import jax
import jax.numpy as jnp
import numpy as np

from arco_tpu.config import ArcoConfig
from arco_tpu.models import net_factory
from arco_tpu.train import checkpoint as ckpt
from arco_tpu.train.arco2d import (init_arco_state, make_arco_modules,
                                   make_arco_step)
from arco_tpu.train.schedule import make_optimizer

B, HW, K = 2, 32, 4


def _build():
    cfg = ArcoConfig(K=4, num_queries=16, num_negatives=8, memobank_size=64,
                     memobank_size_bg=64, memobank_enqueue=16, topk=2)
    model = net_factory("unet", in_chns=1, class_num=K)
    modules = make_arco_modules(model, HW, HW, batch_size=B)
    tx = make_optimizer(0.01, 100)
    state = init_arco_state(jax.random.PRNGKey(0), modules, cfg,
                            (B, HW, HW, 1), tx)
    step = make_arco_step(modules, cfg, tx, num_classes=K,
                          max_iterations=100)
    rng = np.random.RandomState(0)
    label = rng.randint(0, K, size=(B, HW, HW)).astype(np.int32)
    image = jnp.asarray(label[..., None].astype(np.float32) / (K - 1))
    batch = {"image_l": image, "label_l": jnp.asarray(label),
             "image_u": image}
    return state, step, batch


class TestCheckpointRoundTrip:
    def test_full_state_restore_and_deterministic_continue(self, tmp_path):
        state, step, batch = _build()
        state, _ = step(state, batch)
        snapshot = str(tmp_path / "snap")
        ckpt.save_state(snapshot, int(state.step), state)
        assert ckpt.latest_step(snapshot) == 1

        # rebuild a fresh skeleton and restore into it
        fresh, step2, _ = _build()
        restored = ckpt.restore_state(snapshot, 1, fresh)

        for a, b in zip(jax.tree_util.tree_leaves(state),
                        jax.tree_util.tree_leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # continuing from the restore matches continuing the original
        s1, m1 = step(state, batch)
        s2, m2 = step2(restored, batch)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-5)

    def test_stage_handoff_extracts_model(self, tmp_path):
        state, step, batch = _build()
        snapshot = str(tmp_path / "snap2")
        ckpt.save_state(snapshot, 0, state)
        params, stats = ckpt.load_model_params(snapshot, 0, None, None)
        a = jax.tree_util.tree_leaves(params)[0]
        b = jax.tree_util.tree_leaves(state.params["model"])[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_model_only_checkpoint_feeds_eval_and_handoff(self, tmp_path):
        """save_model_state writes an iter_<N> restorable by
        load_model_params — the per-1000-iteration sweep checkpoint."""
        state, step, batch = _build()
        snapshot = str(tmp_path / "snap3")
        ckpt.save_model_state(snapshot, 5, state)
        assert ckpt.latest_step(snapshot) == 5
        params, stats = ckpt.load_model_params(snapshot, 5, None, None)
        a = jax.tree_util.tree_leaves(params)[0]
        b = jax.tree_util.tree_leaves(state.params["model"])[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_rolling_full_state_prunes_and_restores(self, tmp_path):
        """full_iter resume checkpoints: rolling prune, and restore
        recovers everything EXCEPT the excluded memory banks (GB-scale,
        pathological bulk D2H over the tunnel; they refill on resume) —
        those come back as the fresh target's values."""
        state, step, batch = _build()
        state, _ = step(state, batch)  # step so banks differ from init
        snapshot = str(tmp_path / "snap4")
        for s in (1, 2, 3):
            ckpt.save_full_state(snapshot, s, state, keep=2)
        assert ckpt.latest_full_step(snapshot) == 3
        import os
        names = sorted(n for n in os.listdir(snapshot)
                       if n.startswith("full_iter_"))
        assert names == ["full_iter_2", "full_iter_3"]
        # model-only iter_ scan must not see full_iter dirs
        assert ckpt.latest_step(snapshot) is None
        fresh, _, _ = _build()
        restored = ckpt.restore_full_state(snapshot, 3, fresh)
        for field in state._fields:
            a_tree = getattr(state if field not in ckpt.RESUME_EXCLUDE
                             else fresh, field)
            b_tree = getattr(restored, field)
            for a, b in zip(jax.tree_util.tree_leaves(a_tree),
                            jax.tree_util.tree_leaves(b_tree)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_degraded_resume_from_model_checkpoint(self, tmp_path):
        """No full_iter state: restore_model_fallback pulls weights/EMA
        from iter_<N>, sets step, and fast-forwards the LR-schedule count
        so poly decay continues instead of restarting."""
        import optax

        from arco_tpu.train.schedule import make_optimizer
        state, step, batch = _build()
        state, _ = step(state, batch)
        snapshot = str(tmp_path / "snap5")
        ckpt.save_model_state(snapshot, 7, state)
        fresh, _, _ = _build()
        tx = make_optimizer(0.01, 100)
        resumed = ckpt.restore_model_fallback(snapshot, 7, fresh, tx)
        assert int(resumed.step) == 7
        a = jax.tree_util.tree_leaves(state.params["model"])[0]
        b = jax.tree_util.tree_leaves(resumed.params["model"])[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # heads restored too (weight-level checkpoint carries full params)
        ah = jax.tree_util.tree_leaves(state.params["feature_extractor"])[0]
        bh = jax.tree_util.tree_leaves(
            resumed.params["feature_extractor"])[0]
        np.testing.assert_array_equal(np.asarray(ah), np.asarray(bh))
        # LR schedule count fast-forwarded
        is_sched = lambda x: isinstance(x, optax.ScaleByScheduleState)
        counts = [int(s.count) for s in jax.tree_util.tree_leaves(
            resumed.opt_state, is_leaf=is_sched) if is_sched(s)]
        assert counts and all(c == 7 for c in counts)
