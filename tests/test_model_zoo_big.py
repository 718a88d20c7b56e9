"""Shape tests for the heavyweight zoo: TransUNet, EfficientUNet, Swin-UNet,
DeepLab, HAR/STEGO variants. Tiny inputs keep compile time tractable."""

import jax
import jax.numpy as jnp
import pytest

from arco_tpu.models import net_factory


def run_model(module, x):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = module.init(rngs, x, train=False)
    return module.apply(variables, x, train=False,
                        rngs={"dropout": jax.random.PRNGKey(1)})


class TestTransUNet:
    def test_vit_seg(self):
        model = net_factory("ViT_Seg", in_chns=1, class_num=4)
        out = run_model(model, jnp.ones((1, 64, 64, 1)))
        logits, latent, fmap = out
        assert logits.shape == (1, 64, 64, 4)
        assert latent.shape == (1, 4, 4, 768)   # 1/16 grid, hidden 768


class TestEfficientUNet:
    def test_effi_unet(self):
        model = net_factory("efficient_unet", in_chns=1, class_num=4)
        logits, latent, fmap = run_model(model, jnp.ones((1, 64, 64, 1)))
        assert logits.shape == (1, 64, 64, 4)
        assert latent.shape[1] == 2             # 1/32


class TestSwinUnet:
    def test_swin(self):
        model = net_factory("swin_unet", in_chns=1, class_num=4)
        logits, latent, fmap = run_model(model, jnp.ones((1, 64, 64, 1)))
        assert logits.shape == (1, 64, 64, 4)
        assert latent.shape == (1, 2, 2, 96 * 8)

    def test_swin_config_surface(self):
        """Reference config knobs (swin...decoder_sys.py:618-633) are wired:
        APE adds a position-embedding param, depths_decoder changes decoder
        depth, qk_scale/patch_norm accepted."""
        from arco_tpu.models.swin_unet import SwinUnet
        x = jnp.ones((1, 32, 32, 1))
        rngs = {"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}
        m = SwinUnet(num_classes=4, in_chns=1, embed_dim=24,
                     depths=(1, 1, 1, 1), num_heads=(2, 2, 2, 2),
                     window_size=4, ape=True, patch_norm=False,
                     qk_scale=0.2, depths_decoder=(1, 2, 2, 2))
        variables = m.init(rngs, x, train=False)
        assert "absolute_pos_embed" in variables["params"]
        logits, _, _ = m.apply(variables, x, train=False,
                               rngs={"dropout": jax.random.PRNGKey(1)})
        assert logits.shape == (1, 32, 32, 4)

    def test_swin_drop_path_train_eval_distinction(self):
        """drop_path 0.1: eval is deterministic; train with different
        dropout rngs produces different outputs (stochastic depth active)."""
        from arco_tpu.models.swin_unet import SwinUnet
        x = jnp.linspace(0, 1, 32 * 32).reshape(1, 32, 32, 1)
        m = SwinUnet(num_classes=4, in_chns=1, embed_dim=24,
                     depths=(1, 1, 1, 1), num_heads=(2, 2, 2, 2),
                     window_size=4, drop_path_rate=0.5)
        variables = m.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x,
                           train=False)
        e1, _, _ = m.apply(variables, x, train=False,
                           rngs={"dropout": jax.random.PRNGKey(2)})
        e2, _, _ = m.apply(variables, x, train=False,
                           rngs={"dropout": jax.random.PRNGKey(3)})
        assert jnp.allclose(e1, e2)
        t1, _, _ = m.apply(variables, x, train=True,
                           rngs={"dropout": jax.random.PRNGKey(2)})
        t2, _, _ = m.apply(variables, x, train=True,
                           rngs={"dropout": jax.random.PRNGKey(3)})
        assert not jnp.allclose(t1, t2)


class TestDeepLab:
    def test_v2_and_v3(self):
        from arco_tpu.models.deeplab import model_generator
        for head in ("deeplabv2", "deeplabv3"):
            model = model_generator(head, "resnet50", num_classes=21)
            logits, latent, fmap = run_model(model,
                                             jnp.ones((1, 64, 64, 3)))
            assert logits.shape == (1, 64, 64, 21)


class TestVariants:
    def test_unet_har_exposes_bn_taps(self):
        model = net_factory("unet_har", in_chns=1, class_num=4)
        logits, latent, fmap, bns = run_model(model, jnp.ones((1, 32, 32, 1)))
        assert logits.shape == (1, 32, 32, 4)
        assert len(bns) == 18  # 9 conv blocks x 2 taps

    def test_unet_stego(self):
        model = net_factory("unet_stego", in_chns=1, class_num=4)
        logits, latent, fmap = run_model(model, jnp.ones((1, 32, 32, 1)))
        assert logits.shape == (1, 32, 32, 4)
