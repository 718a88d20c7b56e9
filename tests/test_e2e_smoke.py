"""End-to-end smoke: supervised training on a synthetic ACDC-shaped dataset
improves volume Dice (SURVEY §4: 'one end-to-end smoke train, loss
decreases, per entry point')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arco_tpu.data.datasets import SliceDataset
from arco_tpu.data.synthetic import make_acdc_like
from arco_tpu.eval.slice2d import evaluate_2d
from arco_tpu.models import net_factory
from arco_tpu.train.schedule import make_optimizer
from arco_tpu.train.supervised import (init_supervised_state,
                                       make_predict_fn,
                                       make_supervised_step)


@pytest.fixture(scope="module")
def acdc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("acdc_e2e")
    return make_acdc_like(str(root), n_train=16, n_val=1, size=(32, 32),
                          num_classes=3)


class TestSupervisedEndToEnd:
    def test_train_improves_dice(self, acdc_root):
        num_classes = 3
        model = net_factory("unet", in_chns=1, class_num=num_classes)
        tx = make_optimizer(0.05, 60)
        state = init_supervised_state(jax.random.PRNGKey(0), model, tx,
                                      (8, 32, 32, 1))
        step = make_supervised_step(model, tx, num_classes)
        ds = SliceDataset(acdc_root, "train", output_size=(32, 32),
                          transform=False)
        val = SliceDataset(acdc_root, "val", list_name="val.list")
        host_rng = np.random.RandomState(0)

        predict = make_predict_fn(model)

        def run_eval(state):
            def pf(x):
                return predict((state.params, state.batch_stats), x)
            res = evaluate_2d(val.sample_list,
                              lambda c: val.load(val.sample_list.index(c)),
                              pf, num_classes, input_size=(32, 32))
            return float(res["mean"][0])

        dice_before = run_eval(state)
        losses = []
        for it in range(60):
            idx = host_rng.randint(0, len(ds), size=8)
            samples = [ds.get(i, host_rng) for i in idx]
            batch = {"image": jnp.asarray(
                         np.stack([s["image"] for s in samples])),
                     "label": jnp.asarray(
                         np.stack([s["label"] for s in samples]))}
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        dice_after = run_eval(state)

        assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])
        assert dice_after > dice_before
        assert dice_after > 0.35, dice_after
