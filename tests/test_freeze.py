"""Tests for the encoder/decoder freeze surface (train/freeze.py).

Reference contract: --train_encoder/--train_decoder (pretrain_2D.py:71-72)
freeze half the backbone (unetWithArgs.py:326-343), switch the pretrain loss
to k1*loss_latent when encoder-only (pretrain_2D.py:249), and change the
snapshot suffix (pretrain_2D.py:313-320).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arco_tpu.config import ISDConfig
from arco_tpu.models import net_factory, net_factory_3d
from arco_tpu.train import freeze
from arco_tpu.train.pretrain import (init_pretrain_state, make_isd_modules,
                                     make_pretrain_step)
from arco_tpu.train.schedule import make_optimizer


def test_snapshot_suffix():
    assert freeze.snapshot_suffix(True, True) == "final"
    assert freeze.snapshot_suffix(True, False) == "_train_encoder"
    assert freeze.snapshot_suffix(False, True) == "_train_decoder"
    # the reference crashes here (suffix never assigned); explicit marker
    assert freeze.snapshot_suffix(False, False) == "_frozen"


def _leaf_names(labels):
    flat, _ = jax.tree_util.tree_flatten_with_path(labels)
    return {jax.tree_util.keystr(p): v for p, v in flat}


def test_unet_param_classification():
    model = net_factory("unet", in_chns=1, class_num=4)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)},
                   jnp.zeros((1, 32, 32, 1)), train=True)
    labels = freeze.model_param_labels(v["params"], train_encoder=False,
                                       train_decoder=True)
    named = _leaf_names(labels)
    assert named  # non-empty
    for path, lab in named.items():
        if "Encoder" in path:
            assert lab == "freeze", path
        else:
            assert lab == "train", path


def test_vnet_param_classification():
    model = net_factory_3d("vnet", in_chns=1, class_num=2)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)},
                   jnp.zeros((1, 16, 16, 8, 1)), train=True)
    # encoder = VNetConvBlock_0..4 + DownBlock_* (vnetWithArgs.py:180-201)
    labels = freeze.model_param_labels(v["params"], train_encoder=True,
                                       train_decoder=False)
    for name, sub in labels.items():
        lab = jax.tree_util.tree_leaves(sub)[0]
        if name.startswith("DownBlock"):
            assert lab == "train", name
        elif name.startswith("VNetConvBlock"):
            idx = int(name.rsplit("_", 1)[-1])
            assert lab == ("train" if idx <= 4 else "freeze"), name
        else:  # UpBlock_*, Conv_0 (out conv)
            assert lab == "freeze", name


def test_unknown_module_rejected():
    with pytest.raises(ValueError, match="cannot classify"):
        freeze.model_param_labels({"Mystery_0": {"kernel": jnp.zeros(3)}},
                                  True, False)


@pytest.fixture(scope="module")
def pretrain_setup():
    cfg = ISDConfig(K=8, latent_feature_size=32, output_pooling_size=4,
                    patch_size=16)
    model = net_factory("unet", in_chns=1, class_num=4)
    modules = make_isd_modules(model, num_classes=4, latent_feature_size=32,
                               output_pooling_size=4)
    state = init_pretrain_state(jax.random.PRNGKey(0), modules, cfg,
                                (4, 32, 32, 1), max_iterations=100)
    rng = np.random.RandomState(0)
    batch = {
        "student_image": jnp.asarray(rng.randn(4, 32, 32, 1),
                                     jnp.float32),
        "teacher_image": jnp.asarray(rng.randn(4, 32, 32, 1),
                                     jnp.float32),
        "label": jnp.asarray(rng.randint(0, 4, (4, 32, 32)), jnp.int32)}
    return cfg, modules, state, batch


def _run_one_step(cfg, modules, state, batch):
    # the jitted step donates its input state; snapshot params first and
    # feed a copy so the module-scoped fixture survives across tests
    before = jax.tree_util.tree_map(lambda a: np.asarray(a).copy(),
                                    state.params)
    state = jax.tree_util.tree_map(jnp.copy, state)
    tx = make_optimizer(0.01, 100)
    tx = freeze.apply_freeze(tx, state.params, cfg.train_encoder,
                             cfg.train_decoder)
    state = state._replace(opt_state=tx.init(state.params))
    step = make_pretrain_step(modules, cfg, tx, labeled_bs=2, num_classes=4)
    new_state, metrics = step(state, batch)
    return before, new_state, metrics


def test_frozen_encoder_params_bit_identical(pretrain_setup):
    cfg, modules, state, batch = pretrain_setup
    cfg = dataclasses.replace(cfg, train_encoder=False, train_decoder=True)
    before, new_state, _ = _run_one_step(cfg, modules, state, batch)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        before["model"]["Encoder_0"],
        new_state.params["model"]["Encoder_0"])
    # the decoder must still move
    d0 = jax.tree_util.tree_leaves(before["model"]["Decoder_0"])[0]
    d1 = jax.tree_util.tree_leaves(
        new_state.params["model"]["Decoder_0"])[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))


def test_encoder_only_loss_branch(pretrain_setup):
    """train_encoder & !train_decoder -> loss == k1 * loss_latent
    (pretrain_2D.py:249); the decoder must stay bit-identical."""
    cfg, modules, state, batch = pretrain_setup
    cfg = dataclasses.replace(cfg, train_encoder=True, train_decoder=False,
                              k1=0.7)
    before, new_state, metrics = _run_one_step(cfg, modules, state, batch)
    np.testing.assert_allclose(float(metrics["loss"]),
                               0.7 * float(metrics["loss_latent"]),
                               rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        before["model"]["Decoder_0"],
        new_state.params["model"]["Decoder_0"])
    e0 = jax.tree_util.tree_leaves(before["model"]["Encoder_0"])[0]
    e1 = jax.tree_util.tree_leaves(
        new_state.params["model"]["Encoder_0"])[0]
    assert not np.allclose(np.asarray(e0), np.asarray(e1))


def test_both_trainable_is_noop_wrapper(pretrain_setup):
    cfg, modules, state, batch = pretrain_setup
    tx = make_optimizer(0.01, 100)
    assert freeze.apply_freeze(tx, state.params, True, True) is tx
