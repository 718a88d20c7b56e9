"""Two-stage pipeline smoke through the actual CLI train() functions:
pretrain -> checkpoint -> ARCO stage consuming the stage-1 checkpoint ->
evaluation — on a synthetic ACDC-shaped dataset. This exercises the full
orchestration layer (datasets, samplers, prefetch, steps, orbax handoff)
exactly as a user would run it."""

import os

import numpy as np
import pytest

from arco_tpu.config import TrainConfig
from arco_tpu.data.synthetic import make_acdc_like


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipe")
    data = make_acdc_like(str(root / "ACDC"), n_train=30, n_val=1,
                          size=(32, 32), num_classes=3)
    return {"data": data, "model_dir": str(root / "model")}


def tiny_cfg(env, exp):
    cfg = TrainConfig()
    cfg.exp = exp
    cfg.data.root_path = env["data"]
    cfg.data.patch_size = (32, 32)
    cfg.data.num_classes = 3
    cfg.data.batch_size = 2
    cfg.data.labeled_bs = 1
    cfg.data.labeled_num = 1          # -> 23 slices budget; we have 30
    cfg.optim.max_iterations = 6
    cfg.ckpt_every = 6
    cfg.log_every = 3
    cfg.snapshot_dir = env["model_dir"]
    cfg.compute_dtype = "float32"
    cfg.seed = 7
    # shrink the heavy knobs so CPU compiles stay tractable
    cfg.isd.K = 2
    cfg.isd.latent_feature_size = 32
    cfg.isd.output_pooling_size = 4
    cfg.isd.patch_size = 16
    cfg.arco.K = 2
    cfg.arco.num_queries = 16
    cfg.arco.num_negatives = 8
    cfg.arco.memobank_size = 64
    cfg.arco.memobank_size_bg = 64
    cfg.arco.memobank_enqueue = 16
    cfg.arco.topk = 2
    return cfg


@pytest.mark.slow
class TestTwoStagePipeline:
    def test_pretrain_then_arco_then_eval(self, env):
        from arco_tpu.cli import pretrain_2d, train_arco_2d

        # ---- stage 1 -----------------------------------------------------
        cfg1 = tiny_cfg(env, "ACDC/pretrain_smoke")
        snap1 = os.path.join(env["model_dir"],
                             "ACDC/pretrain_smoke_1_labeledfinal", "unet")
        assert pretrain_2d.train(cfg1, snap1) == "Training Finished!"
        assert any(n.startswith("iter_") for n in os.listdir(snap1))

        # ---- stage 2 consumes the stage-1 checkpoint ----------------------
        cfg2 = tiny_cfg(env, "ACDC/arco_smoke")
        cfg2.resume = "ACDC/pretrain_smoke"
        snap2 = os.path.join(env["model_dir"],
                             "ACDC/arco_smoke_1_labeledfinal", "unet")
        assert train_arco_2d.train(cfg2, snap2) == "Training Finished!"
        assert any(n.startswith("iter_") for n in os.listdir(snap2))

        # ---- evaluation on the held-out volume ----------------------------
        import jax
        import jax.numpy as jnp
        from arco_tpu.data.datasets import SliceDataset
        from arco_tpu.eval.slice2d import evaluate_2d
        from arco_tpu.models import net_factory
        from arco_tpu.train import checkpoint as ckpt

        step = ckpt.latest_step(snap2)
        params, stats = ckpt.load_model_params(snap2, step, None, None)
        model = net_factory("unet", in_chns=1, class_num=3)

        @jax.jit
        def predict(x):
            variables = {"params": params}
            if stats:
                variables["batch_stats"] = stats
            logits, _, _ = model.apply(
                variables, x, train=False,
                rngs={"dropout": jax.random.PRNGKey(0)})
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        val = SliceDataset(env["data"], "val", list_name="val.list")
        res = evaluate_2d(val.sample_list,
                          lambda c: val.load(val.sample_list.index(c)),
                          predict, 3, input_size=(32, 32))
        assert np.isfinite(res["mean"]).all()


@pytest.mark.slow
class TestPretrainResume:
    def test_pretrain_resumes_from_own_checkpoint(self, env):
        """A restarted pretrain must pick up its iter_<N> full-state
        checkpoint and continue (elasticity the reference's stage-1 lacks;
        live-fired need: the 3D stage-1 is a multi-hour run over a tunnel
        that stalls)."""
        from arco_tpu.cli.pretrain_2d import train

        cfg = tiny_cfg(env, "ACDC/pre_resume")
        cfg.ckpt_every = 3
        cfg.optim.max_iterations = 3
        snap = os.path.join(env["model_dir"],
                            "ACDC/pre_resume_1_labeledfinal", cfg.model)
        train(cfg, snap)
        assert os.path.isdir(os.path.join(snap, "iter_3"))

        cfg2 = tiny_cfg(env, "ACDC/pre_resume")
        cfg2.ckpt_every = 3
        cfg2.optim.max_iterations = 6
        train(cfg2, snap)
        # the CLI's basicConfig(force=True) owns the handlers (it must, the
        # site plugin pre-configures root), so assert on log.txt itself
        with open(os.path.join(snap, "log.txt")) as f:
            assert "resuming pretrain state from iter_3" in f.read()
        assert os.path.isdir(os.path.join(snap, "iter_6"))
