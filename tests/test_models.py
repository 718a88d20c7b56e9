"""Shape/contract tests for the model zoo, mirroring the reference __main__
smoke blocks (unetWithArgs.py:421-430, vnetWithArgs.py:262-283)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arco_tpu.models import net_factory, net_factory_3d
from arco_tpu.models.heads import (FeatureExtractor, LatentMLP,
                                   LatentPredictor, OutputsPredictor,
                                   ProjectionHead, QRepresentation,
                                   RepresentationHead)


def init_and_apply(model, x, train=False, rngs_extra=()):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    for name in rngs_extra:
        rngs[name] = jax.random.PRNGKey(2)
    variables = model.init(rngs, x, train=train)
    out = model.apply(variables, x, train=train,
                      rngs={k: v for k, v in rngs.items() if k != "params"},
                      mutable=["batch_stats"] if train else False)
    return out[0] if train else out


class TestUNet2D:
    def test_contract(self):
        """unetWithArgs.py:345-348: (logits, latent, 5 feature maps)."""
        model = net_factory("unet", in_chns=1, class_num=4)
        x = jnp.ones((2, 64, 64, 1))
        logits, latent, fmap = init_and_apply(model, x)
        assert logits.shape == (2, 64, 64, 4)
        assert latent.shape == (2, 4, 4, 256)      # H/16 bottleneck
        chans = [f.shape[-1] for f in fmap]
        assert chans == [256, 128, 64, 32, 16]
        sizes = [f.shape[1] for f in fmap]
        assert sizes == [4, 8, 16, 32, 64]

    def test_train_mode_has_batch_stats(self):
        model = net_factory("unet", in_chns=1, class_num=4)
        x = jnp.ones((2, 32, 32, 1))
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)}, x,
                               train=True)
        assert "batch_stats" in variables

    def test_param_count_close_to_reference(self):
        """Reference 2D UNet ~= 1.8M params (SURVEY §2.9)."""
        from arco_tpu.utils.tree import param_count
        model = net_factory("unet", in_chns=1, class_num=4)
        v = model.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)},
                       jnp.ones((1, 32, 32, 1)), train=False)
        n = param_count(v["params"])
        assert 1.5e6 < n < 2.2e6, n

    @pytest.mark.parametrize("name,n_out", [("unet_ds", 4), ("unet_urpc", 4),
                                            ("unet_cct", 4)])
    def test_variants(self, name, n_out):
        model = net_factory(name, in_chns=1, class_num=4)
        x = jnp.ones((2, 32, 32, 1))
        outs = init_and_apply(model, x, rngs_extra=("perturb",))
        assert len(outs) == n_out
        for o in outs:
            assert o.shape == (2, 32, 32, 4)


class TestVNet3D:
    def test_contract(self):
        """vnetWithArgs.py:262-283: feature channels [128,64,32,16,16]."""
        model = net_factory_3d("vnet", in_chns=1, class_num=2)
        x = jnp.ones((1, 32, 32, 16, 1))
        logits, latent, fmap = init_and_apply(model, x)
        assert logits.shape == (1, 32, 32, 16, 2)
        chans = [f.shape[-1] for f in fmap]
        assert chans == [128, 64, 32, 16, 16]
        assert latent.shape == fmap[0].shape


class TestHeads:
    def test_feature_extractor_2d(self):
        fmaps = [jnp.ones((2, 4 * 2 ** i, 4 * 2 ** i, c))
                 for i, c in enumerate([256, 128, 64, 32, 16])]
        fe = FeatureExtractor(output_dim=496)
        v = fe.init(jax.random.PRNGKey(0), fmaps)
        out = fe.apply(v, fmaps)
        assert out.shape == (2, 64, 64, 496)

    def test_feature_extractor_3d(self):
        fmaps = [jnp.ones((1, 4 * 2 ** i, 4 * 2 ** i, 2 * 2 ** i, c))
                 for i, c in enumerate([128, 64, 32, 16, 16])]
        fe = FeatureExtractor(fea_dim=(128, 64, 32, 16, 16), output_dim=16)
        v = fe.init(jax.random.PRNGKey(0), fmaps)
        out = fe.apply(v, fmaps)
        assert out.shape == (1, 64, 64, 32, 16)

    def test_feature_extractor_matches_reference_cascade(self):
        """The composed-matrix FeatureExtractor must equal the reference's
        explicit cascade (conv+residual, upsample, concat; model_2D.py:20-56)
        computed from the SAME parameters — the restructure is exact linear
        algebra, not an approximation."""
        from arco_tpu.ops.interpolate import resize_bilinear
        rng = np.random.RandomState(0)
        fea_dim = (32, 16, 8, 4, 4)
        fmaps = [jnp.asarray(rng.randn(2, 4 * 2 ** i, 4 * 2 ** i, c)
                             .astype(np.float32))
                 for i, c in enumerate(fea_dim)]
        fe = FeatureExtractor(fea_dim=fea_dim, output_dim=12)
        v = fe.init(jax.random.PRNGKey(3), fmaps)
        out = fe.apply(v, fmaps)

        def conv(name, x):
            kern = v["params"][name]["kernel"]
            return jnp.einsum("...c,co->...o",
                              x, kern.reshape(kern.shape[-2:]))

        x = conv("fea0", fmaps[0]) + fmaps[0]
        for i in range(1, 5):
            x = resize_bilinear(x, fmaps[i].shape[1:-1], align_corners=True)
            x = jnp.concatenate([x, fmaps[i]], axis=-1)
            if i < 4:
                x = conv(f"fea{i}", x) + x
            else:
                x = conv("fea4", x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                                   rtol=2e-4, atol=2e-4)

    def test_projection_and_predictors(self):
        x = jnp.ones((3, 64, 64, 4))
        ph = ProjectionHead(proj_dim=4, output_pooling_size=8)
        v = ph.init(jax.random.PRNGKey(0), x)
        out = ph.apply(v, x)
        assert out.shape == (3, 8, 8, 4)

        op = OutputsPredictor(num_classes=4)
        v = op.init(jax.random.PRNGKey(0), out)
        assert op.apply(v, out).shape == (3, 8, 8, 4)

        lm = LatentMLP(input_channels=256, num_class=512, pooling_size=1)
        lat = jnp.ones((3, 16, 16, 256))
        v = lm.init(jax.random.PRNGKey(0), lat)
        z = lm.apply(v, lat)
        assert z.shape == (3, 512)

        lp = LatentPredictor(feature_size=512)
        v = lp.init(jax.random.PRNGKey(0), z)
        assert lp.apply(v, z).shape == (3, 512)

    def test_representation_heads(self):
        x = jnp.ones((2, 16, 16, 496))
        rh = RepresentationHead(output_channel=512)
        v = rh.init(jax.random.PRNGKey(0), x)
        assert rh.apply(v, x).shape == (2, 16, 16, 512)
        qr = QRepresentation(channels=496)
        v = qr.init(jax.random.PRNGKey(0), x)
        assert qr.apply(v, x).shape == (2, 16, 16, 496)
