"""3D ARCO and pretrain step smoke tests on tiny V-Net shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from arco_tpu.config import ArcoConfig, ISDConfig
from arco_tpu.models import net_factory_3d
from arco_tpu.train.arco2d import (init_arco_state, make_arco_modules,
                                   make_arco_step)
from arco_tpu.train.pretrain import (init_pretrain_state, make_isd_modules,
                                     make_pretrain_step)
from arco_tpu.train.schedule import make_optimizer

B, S, K = 2, (32, 32, 16), 2


def batch3d(rng):
    label = rng.randint(0, K, size=(B,) + S).astype(np.int32)
    image = label[..., None].astype(np.float32) \
        + 0.1 * rng.randn(B, *S, 1).astype(np.float32)
    return jnp.asarray(image), jnp.asarray(label)


class TestArco3D:
    def test_full_3d_step(self, rng):
        cfg = ArcoConfig(K=B, num_queries=16, num_negatives=8,
                         memobank_size=128, memobank_size_bg=128,
                         memobank_enqueue=32, topk=2,
                         use_eqv_loss=False, compute_eqv=True,
                         use_photometric=False, use_adv_morph=False)
        model = net_factory_3d("vnet", in_chns=1, class_num=K)
        modules = make_arco_modules(model, S[1], S[0], batch_size=B,
                                    feature_channels=(128, 64, 32, 16, 16),
                                    fused_dim=16)
        tx = make_optimizer(0.01, 100)
        state = init_arco_state(jax.random.PRNGKey(0), modules, cfg,
                                (B,) + S + (1,), tx)
        step = make_arco_step(modules, cfg, tx, num_classes=K,
                              max_iterations=100)
        image, label = batch3d(rng)
        batch = {"image_l": image, "label_l": label, "image_u": image}
        state, metrics = step(state, batch)
        for k, v in metrics.items():
            if getattr(v, "ndim", 0):  # pred_l_label image map
                continue
            assert np.isfinite(float(v)), (k, float(v))
        # eqv computed but excluded (train_arco_3d.py:390-391)
        total_wo_eqv = (cfg.k1 * metrics["reco_loss"]
                        + cfg.k3 * metrics["unsup_loss"]
                        + metrics["loss_ce"] + metrics["loss_dice"]
                        + cfg.k4 * metrics["loss_q"])
        np.testing.assert_allclose(float(metrics["loss"]),
                                   float(total_wo_eqv), rtol=1e-4)


class TestPretrain3D:
    def test_3d_pretrain_step(self, rng):
        cfg = ISDConfig(K=2 * B, latent_feature_size=32,
                        output_pooling_size=4, patch_size=16)
        model = net_factory_3d("vnet", in_chns=1, class_num=K)
        modules = make_isd_modules(model, num_classes=K,
                                   latent_feature_size=32,
                                   output_pooling_size=4,
                                   latent_channels=256)
        state = init_pretrain_state(jax.random.PRNGKey(0), modules, cfg,
                                    (B,) + S + (1,), max_iterations=100)
        tx = make_optimizer(0.01, 100)
        state = state._replace(opt_state=tx.init(state.params))
        step = make_pretrain_step(modules, cfg, tx, labeled_bs=1,
                                  num_classes=K)
        image, label = batch3d(rng)
        batch = {"student_image": image, "teacher_image": image,
                 "label": label}
        state, metrics = step(state, batch)
        for k, v in metrics.items():
            if getattr(v, "ndim", 0):  # pred_l_label image map
                continue
            assert np.isfinite(float(v)), k
        assert int(state.queue_ptr) == B


class TestEqvOnLogOnly:
    def test_two_variant_dispatch_shares_state(self, rng):
        """--arco.eqv_on_log_only builds a second compiled step without the
        logging-only eqv leg; both programs must accept the same state
        pytree and advance it interchangeably (the perf knob behind the
        767 -> ~435 ms/step on-chip win, cli/train_arco_3d.py)."""
        import dataclasses

        cfg = ArcoConfig(K=B, num_queries=16, num_negatives=8,
                         memobank_size=128, memobank_size_bg=128,
                         memobank_enqueue=32, topk=2,
                         use_eqv_loss=False, compute_eqv=True,
                         use_photometric=False, use_adv_morph=False)
        model = net_factory_3d("vnet", in_chns=1, class_num=K)
        modules = make_arco_modules(model, S[1], S[0], batch_size=B,
                                    feature_channels=(128, 64, 32, 16, 16),
                                    fused_dim=16)
        tx = make_optimizer(0.01, 100)
        state = init_arco_state(jax.random.PRNGKey(0), modules, cfg,
                                (B,) + S + (1,), tx)
        step_eqv = make_arco_step(modules, cfg, tx, num_classes=K,
                                  max_iterations=100)
        step_noeqv = make_arco_step(
            modules, dataclasses.replace(cfg, compute_eqv=False), tx,
            num_classes=K, max_iterations=100)

        image, label = batch3d(rng)
        batch = {"image_l": image, "label_l": label, "image_u": image}
        # alternate like the trainer: noeqv between logging points,
        # eqv on them
        for i, fn in enumerate([step_noeqv, step_noeqv, step_eqv]):
            state, m = fn(state, batch)
            assert np.isfinite(float(m["loss"]))
            if fn is step_noeqv:
                assert float(m["loss_eqv"]) == 0.0
        assert float(m["loss_eqv"]) != 0.0  # the eqv step logged a real one
        assert int(state.step) == 3
