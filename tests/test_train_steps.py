"""End-to-end smoke tests of the jitted train steps on tiny shapes.

These are the integration tests SURVEY §4 prescribes: one jitted step per
stage runs, produces finite losses, and mutates the functional state
(queues/banks/EMA) as the reference's side effects would.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arco_tpu.config import ArcoConfig, ISDConfig
from arco_tpu.models import net_factory
from arco_tpu.train.arco2d import (ArcoState, init_arco_state,
                                   make_arco_modules, make_arco_step,
                                   masked_percentile)
from arco_tpu.train.pretrain import (init_pretrain_state, make_isd_modules,
                                     make_pretrain_step)
from arco_tpu.train.schedule import make_optimizer, poly_schedule
from arco_tpu.train.supervised import (init_supervised_state,
                                       make_predict_fn, make_supervised_step)

B, HW, K = 2, 32, 4


def synthetic_batch(rng, b=B, hw=HW, k=K):
    label = rng.randint(0, k, size=(b, hw, hw)).astype(np.int32)
    image = label[..., None].astype(np.float32) / (k - 1) \
        + 0.1 * rng.randn(b, hw, hw, 1).astype(np.float32)
    return {"image": jnp.array(image), "label": jnp.array(label)}


class TestMaskedPercentile:
    def test_matches_numpy(self, rng):
        vals = rng.randn(1000).astype(np.float32)
        mask = rng.rand(1000) > 0.3
        for pct in [5.0, 20.0, 50.0, 95.0]:
            ours = float(masked_percentile(jnp.array(vals), jnp.array(mask),
                                           pct))
            ref = np.percentile(vals[mask], pct)
            np.testing.assert_allclose(ours, ref, rtol=1e-5)


class TestSupervisedStep:
    def test_loss_decreases(self, rng):
        model = net_factory("unet", in_chns=1, class_num=K)
        tx = make_optimizer(0.05, 100)
        state = init_supervised_state(jax.random.PRNGKey(0), model, tx,
                                      (B, HW, HW, 1))
        step = make_supervised_step(model, tx, K)
        batch = synthetic_batch(rng)
        first = None
        for i in range(8):
            state, metrics = step(state, batch)
            if i == 0:
                first = float(metrics["loss"])
        assert float(metrics["loss"]) < first

    def test_predict_fn(self, rng):
        model = net_factory("unet", in_chns=1, class_num=K)
        tx = make_optimizer(0.01, 100)
        state = init_supervised_state(jax.random.PRNGKey(0), model, tx,
                                      (B, HW, HW, 1))
        predict = make_predict_fn(model)
        out = predict((state.params, state.batch_stats),
                      jnp.zeros((B, HW, HW, 1)))
        assert out.shape == (B, HW, HW)
        assert out.dtype == jnp.int32


class TestPretrainStep:
    def test_step_runs_and_updates_queues(self, rng):
        cfg = ISDConfig(K=4, latent_feature_size=32, output_pooling_size=4,
                        patch_size=16)
        model = net_factory("unet", in_chns=1, class_num=K)
        modules = make_isd_modules(model, num_classes=K,
                                   latent_feature_size=cfg.latent_feature_size,
                                   output_pooling_size=cfg.output_pooling_size)
        state = init_pretrain_state(jax.random.PRNGKey(0), modules, cfg,
                                    (B, HW, HW, 1), max_iterations=100)
        tx = make_optimizer(0.01, 100)
        state = state._replace(opt_state=tx.init(state.params))
        step = make_pretrain_step(modules, cfg, tx, labeled_bs=1,
                                  num_classes=K)
        batch = synthetic_batch(rng)
        batch = {"student_image": batch["image"],
                 "teacher_image": batch["image"], "label": batch["label"]}
        old_queue = np.asarray(state.queue)
        state, metrics = step(state, batch)
        for k, v in metrics.items():
            if getattr(v, "ndim", 0):  # pred_l_label image map
                continue
            assert np.isfinite(float(v)), k
        assert int(state.step) == 1
        assert int(state.queue_ptr) == B
        assert not np.allclose(np.asarray(state.queue)[:B], old_queue[:B])

    def test_ema_moves_toward_student(self, rng):
        cfg = ISDConfig(K=4, latent_feature_size=32, output_pooling_size=4,
                        patch_size=16, m=0.5)
        model = net_factory("unet", in_chns=1, class_num=K)
        modules = make_isd_modules(model, num_classes=K,
                                   latent_feature_size=32,
                                   output_pooling_size=4)
        state = init_pretrain_state(jax.random.PRNGKey(0), modules, cfg,
                                    (B, HW, HW, 1), max_iterations=100)
        tx = make_optimizer(0.05, 100)
        state = state._replace(opt_state=tx.init(state.params))
        step = make_pretrain_step(modules, cfg, tx, labeled_bs=1,
                                  num_classes=K)
        batch = synthetic_batch(rng)
        batch = {"student_image": batch["image"],
                 "teacher_image": batch["image"], "label": batch["label"]}
        state, _ = step(state, batch)
        state, _ = step(state, batch)
        # teacher must differ from init copy after student moved
        leaf_s = jax.tree_util.tree_leaves(state.params["model"])[0]
        leaf_t = jax.tree_util.tree_leaves(state.ema_params["model"])[0]
        assert not np.allclose(np.asarray(leaf_s), np.asarray(leaf_t))


class TestArcoStep:
    def test_full_step(self, rng):
        cfg = ArcoConfig(K=4, num_queries=16, num_negatives=8,
                         memobank_size=128, memobank_size_bg=256,
                         memobank_enqueue=32, topk=2)
        model = net_factory("unet", in_chns=1, class_num=K)
        modules = make_arco_modules(model, HW, HW, batch_size=B)
        tx = make_optimizer(0.01, 100)
        state = init_arco_state(jax.random.PRNGKey(0), modules, cfg,
                                (B, HW, HW, 1), tx)
        step = make_arco_step(modules, cfg, tx, num_classes=K,
                              max_iterations=100)
        b = synthetic_batch(rng)
        b2 = synthetic_batch(np.random.RandomState(7))
        batch = {"image_l": b["image"], "label_l": b["label"],
                 "image_u": b2["image"]}
        state, metrics = step(state, batch)
        for k, v in metrics.items():
            if getattr(v, "ndim", 0):  # pred_l_label image map
                continue
            assert np.isfinite(float(v)), (k, float(v))
        assert int(state.step) == 1
        assert int(state.random_pool_ptr) == B
        assert int(np.asarray(state.memobank.count).sum()) > 0
        # second step re-uses the compiled program and keeps finiteness
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))

    def test_full_step_pallas_infonce(self, rng):
        """--arco.infonce_impl pallas drives the fused streaming kernel
        inside the product step (interpret mode off-TPU); trains and stays
        finite with the bank_normalized fast path the trainer wires."""
        cfg = ArcoConfig(K=4, num_queries=16, num_negatives=8,
                         memobank_size=128, memobank_size_bg=256,
                         memobank_enqueue=32, topk=2,
                         infonce_impl="pallas", pallas_tile=64)
        model = net_factory("unet", in_chns=1, class_num=K)
        modules = make_arco_modules(model, HW, HW, batch_size=B)
        tx = make_optimizer(0.01, 100)
        state = init_arco_state(jax.random.PRNGKey(0), modules, cfg,
                                (B, HW, HW, 1), tx)
        step = make_arco_step(modules, cfg, tx, num_classes=K,
                              max_iterations=100)
        b = synthetic_batch(rng)
        batch = {"image_l": b["image"], "label_l": b["label"],
                 "image_u": synthetic_batch(np.random.RandomState(7))["image"]}
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["reco_loss"]))
        assert int(np.asarray(state.memobank.count).sum()) > 0
