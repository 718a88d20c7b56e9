"""Shape tests for the extended model zoo (factory long tail)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arco_tpu.models import net_factory, net_factory_3d


def run_model(model, x, rngs_extra=()):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, train=False)
    return model.apply(variables, x, train=False,
                       rngs={"dropout": jax.random.PRNGKey(1)})


class TestZoo2D:
    def test_enet(self):
        model = net_factory("enet", in_chns=1, class_num=4)
        logits, latent, fmap = run_model(model, jnp.ones((1, 64, 64, 1)))
        assert logits.shape == (1, 64, 64, 4)
        assert latent.shape[-1] == 128

    def test_pnet(self):
        model = net_factory("pnet", in_chns=1, class_num=4)
        logits, latent, fmap = run_model(model, jnp.ones((1, 32, 32, 1)))
        assert logits.shape == (1, 32, 32, 4)
        assert len(fmap) == 5

    def test_nnunet_2d(self):
        model = net_factory("nnUNet", in_chns=1, class_num=3)
        logits, latent, fmap = run_model(model, jnp.ones((1, 64, 64, 1)))
        assert logits.shape == (1, 64, 64, 3)


class TestZoo3D:
    def test_unet_3d(self):
        model = net_factory_3d("unet_3D", in_chns=1, class_num=2)
        logits, latent, fmap = run_model(model, jnp.ones((1, 16, 16, 16, 1)))
        assert logits.shape == (1, 16, 16, 16, 2)

    def test_attention_unet(self):
        model = net_factory_3d("attention_unet", in_chns=1, class_num=2)
        logits, latent, fmap = run_model(model, jnp.ones((1, 16, 16, 16, 1)))
        assert logits.shape == (1, 16, 16, 16, 2)

    def test_voxresnet(self):
        model = net_factory_3d("voxresnet", in_chns=1, class_num=2)
        logits, latent, fmap = run_model(model, jnp.ones((1, 16, 16, 16, 1)))
        assert logits.shape == (1, 16, 16, 16, 2)

    def test_nnunet_3d_anisotropic(self):
        model = net_factory_3d("nnUNet", in_chns=1, class_num=3)
        # anisotropic pools [1,2,2]x2 then [2,2,2]x2 then [1,2,2]x2:
        # depth needs /4, height/width need /64
        logits, latent, fmap = run_model(model, jnp.ones((1, 4, 64, 64, 1)))
        assert logits.shape == (1, 4, 64, 64, 3)


class TestDiscriminators:
    def test_fc2d(self):
        from arco_tpu.models.discriminator import FCDiscriminator
        d = FCDiscriminator(num_classes=4)
        seg = jnp.ones((2, 64, 64, 4))
        img = jnp.ones((2, 64, 64, 1))
        v = d.init({"params": jax.random.PRNGKey(0)}, seg, img, train=False)
        out = d.apply(v, seg, img, train=False)
        assert out.shape == (2, 2)

    def test_fc3d(self):
        from arco_tpu.models.discriminator import FC3DDiscriminator
        d = FC3DDiscriminator(num_classes=2)
        seg = jnp.ones((1, 32, 32, 16, 2))
        img = jnp.ones((1, 32, 32, 16, 1))
        v = d.init({"params": jax.random.PRNGKey(0)}, seg, img, train=False)
        out = d.apply(v, seg, img, train=False)
        assert out.shape == (1, 2)


class TestTiledPredictor:
    def test_gaussian_and_steps(self):
        from arco_tpu.eval.tiled_predictor import (
            compute_steps_for_sliding_window, get_gaussian)
        g = get_gaussian((8, 8, 8))
        assert g.max() == 1.0 and g.min() > 0
        assert g[4, 4, 4] == g.max()
        steps = compute_steps_for_sliding_window((8, 8, 8), (16, 12, 8), 0.5)
        assert steps[0][0] == 0 and steps[0][-1] == 8
        assert steps[2] == [0]

    def test_predict_tiled_identity_oracle(self):
        from arco_tpu.eval.tiled_predictor import predict_tiled
        rng = np.random.RandomState(0)
        label = (rng.rand(20, 20, 12) > 0.5).astype(np.int32)
        image = label.astype(np.float32)

        def predict(x):
            fg = (x[..., 0] > 0.5).astype(jnp.float32)
            return jnp.stack([1 - fg, fg], axis=-1)

        pred, score = predict_tiled(predict, image, (12, 12, 8), 2,
                                    mirror_axes=(0, 1))
        np.testing.assert_array_equal(pred, label)
