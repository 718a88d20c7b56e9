"""remat flag: same loss value, step still runs (memory behavior is a TPU
property; CPU test asserts numerical equivalence)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from arco_tpu.config import ArcoConfig
from arco_tpu.models import net_factory
from arco_tpu.train.arco2d import (init_arco_state, make_arco_modules,
                                   make_arco_step)
from arco_tpu.train.schedule import make_optimizer

B, HW, K = 2, 32, 4


class TestRemat:
    def test_remat_matches_no_remat(self, rng):
        base = ArcoConfig(K=4, num_queries=16, num_negatives=8,
                          memobank_size=64, memobank_size_bg=64,
                          memobank_enqueue=16, topk=2)
        label = rng.randint(0, K, size=(B, HW, HW)).astype(np.int32)
        image = jnp.asarray(label[..., None].astype(np.float32) / (K - 1))
        batch = {"image_l": image, "label_l": jnp.asarray(label),
                 "image_u": image}

        losses = []
        for remat in (False, True):
            cfg = dataclasses.replace(base, remat=remat)
            model = net_factory("unet", in_chns=1, class_num=K)
            modules = make_arco_modules(model, HW, HW, batch_size=B)
            tx = make_optimizer(0.01, 100)
            state = init_arco_state(jax.random.PRNGKey(0), modules, cfg,
                                    (B, HW, HW, 1), tx)
            step = make_arco_step(modules, cfg, tx, num_classes=K,
                                  max_iterations=100)
            _, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        np.testing.assert_allclose(losses[0], losses[1], rtol=1e-4)
