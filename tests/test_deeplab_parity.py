"""DeepLab-v2 numeric forward parity: the reference's own caffe-style
ResNet-DeepLab (models/deeplab.py:148-260) with seeded random weights,
state_dict-imported into arco_tpu.models.deeplab.DeepLabV2 — logits and the
layer3 feature must match (VERDICT r3 items 5/6: importer + numeric parity,
not shape smoke)."""

import numpy as np
import pytest

from arco_tpu.compat import refbridge as rb

pytestmark = pytest.mark.skipif(
    not rb.reference_available(), reason="reference tree not mounted")

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from arco_tpu.compat.torch_import import (convert_deeplab_state_dict,  # noqa: E402
                                          merge_params)
from arco_tpu.models.deeplab import DeepLabV2, max_pool_ceil  # noqa: E402

NC = 7


def _ref_model():
    dl = rb.import_ref("models.deeplab")
    torch.manual_seed(31)
    model = dl.Res50_Deeplab(num_classes=NC)
    model.eval()
    return model


class TestDeepLabV2Parity:

    @pytest.mark.parametrize("hw", [64, 65])
    def test_maxpool_ceil_matches_torch(self, hw):
        """The trunk's MaxPool2d(3, 2, 1, ceil_mode=True) — the even-size
        case exercises the ceil/floor divergence (deeplab.py:159)."""
        r = np.random.RandomState(0)
        x = r.randn(2, 8, hw, hw).astype(np.float32)
        ref = torch.nn.MaxPool2d(3, 2, 1, ceil_mode=True)(torch.tensor(x))
        mine = max_pool_ceil(jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(mine), ref.numpy().transpose(0, 2, 3, 1), rtol=1e-6)

    def test_forward_parity(self):
        model = _ref_model()
        r = np.random.RandomState(1)
        x = r.rand(2, 3, 65, 65).astype(np.float32)
        with torch.no_grad():
            _, feat_ref, logits_ref = model(torch.tensor(x))

        mine = DeepLabV2(num_classes=NC, layers=(3, 4, 6, 3), upsample=False)
        params, stats = convert_deeplab_state_dict(model.state_dict(),
                                                   layers=(3, 4, 6, 3))
        logits, latent, fmaps = mine.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
        np.testing.assert_allclose(
            np.asarray(latent), feat_ref.numpy().transpose(0, 2, 3, 1),
            rtol=5e-3, atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(logits), logits_ref.numpy().transpose(0, 2, 3, 1),
            rtol=5e-3, atol=5e-4)
        assert len(fmaps) == 4
        assert fmaps[-1].shape[-1] == 2048

    def test_forward_parity_even_input(self):
        """Even input sizes hit the ceil_mode maxpool divergence — parity
        must hold there too."""
        model = _ref_model()
        r = np.random.RandomState(2)
        x = r.rand(1, 3, 64, 64).astype(np.float32)
        with torch.no_grad():
            _, feat_ref, logits_ref = model(torch.tensor(x))
        mine = DeepLabV2(num_classes=NC, layers=(3, 4, 6, 3), upsample=False)
        params, stats = convert_deeplab_state_dict(model.state_dict(),
                                                   layers=(3, 4, 6, 3))
        logits, latent, _ = mine.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
        np.testing.assert_allclose(
            np.asarray(logits), logits_ref.numpy().transpose(0, 2, 3, 1),
            rtol=5e-3, atol=5e-4)

    def test_partial_copy_semantics(self):
        """A trunk-only checkpoint (no layer5, like the caffe pretrains)
        restores the backbone and leaves the classifier at init —
        model_factory.py:55-60 semantics via merge_params."""
        model = _ref_model()
        sd = {k: v for k, v in model.state_dict().items()
              if not k.startswith("layer5")}
        imp_p, imp_s = convert_deeplab_state_dict(sd, layers=(3, 4, 6, 3))
        assert "ClassifierModule_0" not in imp_p

        mine = DeepLabV2(num_classes=NC, layers=(3, 4, 6, 3), upsample=False)
        x = jnp.zeros((1, 33, 33, 3))
        init = mine.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        merged_p = merge_params(init["params"], imp_p)
        merged_s = merge_params(init["batch_stats"], imp_s)
        # trunk leaves replaced, classifier untouched
        got = merged_p["ResNetBackbone_0"]["Conv_0"]["kernel"]
        want = np.asarray(model.conv1.weight.detach().numpy()
                          .transpose(2, 3, 1, 0))
        np.testing.assert_array_equal(np.asarray(got), want)
        np.testing.assert_array_equal(
            np.asarray(merged_p["ClassifierModule_0"]["Conv_0"]["kernel"]),
            np.asarray(init["params"]["ClassifierModule_0"]["Conv_0"]
                       ["kernel"]))
