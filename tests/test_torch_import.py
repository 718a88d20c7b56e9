"""Golden architecture-parity test: a randomly initialized REFERENCE torch
U-Net and the arco_tpu U-Net with IMPORTED weights must produce the same
logits/latent/features in eval mode — the strongest same-architecture proof
and the user-facing .pth migration path."""

import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from arco_tpu.compat.torch_import import convert_unet_state_dict
from arco_tpu.models import net_factory

REF = "/root/reference/code/networks/unetWithArgs.py"


def _load_ref_unet():
    spec = importlib.util.spec_from_file_location("ref_unet_mod", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestTorchImport:
    def test_forward_parity_with_imported_weights(self, rng):
        ref_mod = _load_ref_unet()
        torch.manual_seed(0)
        ref_net = ref_mod.UNet(in_chns=1, class_num=4)
        ref_net.eval()

        params, batch_stats = convert_unet_state_dict(ref_net.state_dict())
        model = net_factory("unet", in_chns=1, class_num=4)

        x = rng.randn(2, 32, 32, 1).astype(np.float32)
        with torch.no_grad():
            t_logits, t_latent, t_fmap = ref_net(
                torch.from_numpy(x.transpose(0, 3, 1, 2)))

        logits, latent, fmap = model.apply(
            {"params": params, "batch_stats": batch_stats},
            jnp.asarray(x), train=False,
            rngs={"dropout": jax.random.PRNGKey(0)})

        np.testing.assert_allclose(
            np.asarray(logits), t_logits.numpy().transpose(0, 2, 3, 1),
            atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(latent), t_latent.numpy().transpose(0, 2, 3, 1),
            atol=2e-4)
        for ours, theirs in zip(fmap, t_fmap):
            np.testing.assert_allclose(
                np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1),
                atol=2e-4)

    def test_vnet_forward_parity(self, rng):
        spec = importlib.util.spec_from_file_location(
            "ref_vnet_mod", "/root/reference/code/networks/vnetWithArgs.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        torch.manual_seed(0)
        ref_net = mod.VNet(n_channels=1, n_classes=2,
                           normalization="batchnorm", has_dropout=True)
        ref_net.eval()

        from arco_tpu.compat.torch_import import convert_vnet_state_dict
        from arco_tpu.models import net_factory_3d
        params, batch_stats = convert_vnet_state_dict(ref_net.state_dict())
        model = net_factory_3d("vnet", in_chns=1, class_num=2)

        x = rng.randn(1, 16, 16, 16, 1).astype(np.float32)
        with torch.no_grad():
            t_logits, t_latent, t_fmap = ref_net(
                torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))

        logits, latent, fmap = model.apply(
            {"params": params, "batch_stats": batch_stats},
            jnp.asarray(x), train=False,
            rngs={"dropout": jax.random.PRNGKey(0)})

        np.testing.assert_allclose(
            np.asarray(logits),
            t_logits.numpy().transpose(0, 2, 3, 4, 1), atol=5e-4)
        for ours, theirs in zip(fmap, t_fmap):
            np.testing.assert_allclose(
                np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 4, 1),
                atol=5e-4)
