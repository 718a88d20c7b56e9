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
