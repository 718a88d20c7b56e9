"""Pretrained-weight importer round-trips (VERDICT r1 missing #2).

Synthetically-generated state dicts with the reference checkpoint key names
and shapes (no egress needed) are converted and merged into initialized flax
params; the merge must cover the expected scopes with exact shape agreement
(deep_merge raises on any mismatch) and the model must run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arco_tpu.compat.pretrained import (convert_efficientnet_state_dict,
                                        convert_swin_state_dict,
                                        convert_vit_npz, deep_merge)


class _T:
    """Tiny torch-tensor stand-in (has .cpu().numpy())."""

    def __init__(self, a):
        self.a = np.asarray(a, np.float32)

    def cpu(self):
        return self

    def numpy(self):
        return self.a

    @property
    def shape(self):
        return self.a.shape


def rand(rng, *shape):
    return rng.randn(*shape).astype(np.float32) * 0.02


class TestViTImport:
    def test_npz_roundtrip_into_transunet(self, rng):
        """Synthetic R50+ViT npz (default stem (3,4,9), 2 transformer
        layers, 14x14+cls posembed to exercise the resize path) imports
        into VisionTransformerSeg and the model runs."""
        from arco_tpu.models.transunet import VisionTransformerSeg
        hidden, mlp, heads, hd = 32, 64, 4, 8
        w = _full_vit_npz(hidden, mlp, heads, hd, n_layers=2)

        m = VisionTransformerSeg(img_size=64, num_classes=3, hidden=hidden,
                                 num_layers=2, num_heads=heads, mlp_dim=mlp,
                                 decoder_channels=(16, 8, 8, 8))
        x = jnp.ones((1, 64, 64, 1))
        variables = m.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x,
                           train=False)
        n_tokens = variables["params"]["pos_embedding"].shape[1]
        sub = convert_vit_npz(w, n_tokens, num_layers=2)
        merged = deep_merge(dict(variables["params"]), sub)
        logits, _, _ = m.apply(
            {"params": merged, "batch_stats": variables["batch_stats"]},
            x, train=False, rngs={"dropout": jax.random.PRNGKey(0)})
        assert logits.shape == (1, 64, 64, 3)
        # golden leaf: npz key lands at the mapped flax path untouched
        np.testing.assert_array_equal(
            np.asarray(merged["TransformerBlock_0"]["Dense_0"]["kernel"]),
            w["Transformer/encoderblock_0/MlpBlock_3/Dense_0/kernel"])
        # posembed was resized (197 tokens with cls -> n_tokens grid)
        assert merged["pos_embedding"].shape == (1, n_tokens, hidden)


def _full_vit_npz(hidden, mlp, heads, hd, n_layers):
    """Synthetic npz for the DEFAULT R50 stem (units 3,4,9, width 64) +
    n_layers transformer blocks, with the reference npz key names."""
    r = np.random.RandomState(7)
    rand_ = lambda *s: r.randn(*s).astype(np.float32) * 0.02
    w = {"conv_root/kernel": rand_(7, 7, 3, 64),
         "gn_root/scale": np.ones(64, np.float32),
         "gn_root/bias": np.zeros(64, np.float32),
         "embedding/kernel": rand_(1, 1, 1024, hidden),
         "embedding/bias": np.zeros(hidden, np.float32),
         "Transformer/encoder_norm/scale": np.ones(hidden, np.float32),
         "Transformer/encoder_norm/bias": np.zeros(hidden, np.float32),
         "Transformer/posembed_input/pos_embedding":
             rand_(1, 197, hidden)}
    widths = [256, 512, 1024]
    cin = 64
    for stage, n_units in enumerate((3, 4, 9)):
        cout, cmid = widths[stage], widths[stage] // 4
        for u in range(1, n_units + 1):
            pre = f"block{stage + 1}/unit{u}/"
            w[pre + "conv1/kernel"] = rand_(1, 1, cin, cmid)
            w[pre + "conv2/kernel"] = rand_(3, 3, cmid, cmid)
            w[pre + "conv3/kernel"] = rand_(1, 1, cmid, cout)
            for g, ch in (("gn1", cmid), ("gn2", cmid), ("gn3", cout)):
                w[pre + f"{g}/scale"] = np.ones((1, 1, ch), np.float32)
                w[pre + f"{g}/bias"] = np.zeros((1, 1, ch), np.float32)
            if u == 1:
                w[pre + "conv_proj/kernel"] = rand_(1, 1, cin, cout)
                w[pre + "gn_proj/scale"] = np.ones((1, 1, cout), np.float32)
                w[pre + "gn_proj/bias"] = np.zeros((1, 1, cout), np.float32)
            cin = cout
    for i in range(n_layers):
        pre = f"Transformer/encoderblock_{i}/"
        att = pre + "MultiHeadDotProductAttention_1/"
        for name in ("query", "key", "value"):
            w[att + f"{name}/kernel"] = rand_(hidden, heads, hd)
            w[att + f"{name}/bias"] = np.zeros((heads, hd), np.float32)
        w[att + "out/kernel"] = rand_(heads, hd, hidden)
        w[att + "out/bias"] = np.zeros(hidden, np.float32)
        for ln in ("LayerNorm_0", "LayerNorm_2"):
            w[pre + f"{ln}/scale"] = np.ones(hidden, np.float32)
            w[pre + f"{ln}/bias"] = np.zeros(hidden, np.float32)
        w[pre + "MlpBlock_3/Dense_0/kernel"] = rand_(hidden, mlp)
        w[pre + "MlpBlock_3/Dense_0/bias"] = np.zeros(mlp, np.float32)
        w[pre + "MlpBlock_3/Dense_1/kernel"] = rand_(mlp, hidden)
        w[pre + "MlpBlock_3/Dense_1/bias"] = np.zeros(hidden, np.float32)
    return w


class TestSwinImport:
    def _make_sd(self, rng, embed=24, depths=(1, 1, 1, 1),
                 heads=(2, 2, 2, 2), ws=4, with_wrapper=True):
        sd = {}
        sd["patch_embed.proj.weight"] = _T(rand(rng, embed, 3, 4, 4))
        sd["patch_embed.proj.bias"] = _T(np.zeros(embed))
        sd["patch_embed.norm.weight"] = _T(np.ones(embed))
        sd["patch_embed.norm.bias"] = _T(np.zeros(embed))
        for i, d in enumerate(depths):
            c = embed * 2 ** i
            for j in range(d):
                pre = f"layers.{i}.blocks.{j}."
                sd[pre + "norm1.weight"] = _T(np.ones(c))
                sd[pre + "norm1.bias"] = _T(np.zeros(c))
                sd[pre + "attn.qkv.weight"] = _T(rand(rng, 3 * c, c))
                sd[pre + "attn.qkv.bias"] = _T(np.zeros(3 * c))
                sd[pre + "attn.proj.weight"] = _T(rand(rng, c, c))
                sd[pre + "attn.proj.bias"] = _T(np.zeros(c))
                sd[pre + "attn.relative_position_bias_table"] = _T(
                    rand(rng, (2 * 7 - 1) ** 2, heads[i]))  # window 7 src
                sd[pre + "norm2.weight"] = _T(np.ones(c))
                sd[pre + "norm2.bias"] = _T(np.zeros(c))
                sd[pre + "mlp.fc1.weight"] = _T(rand(rng, 4 * c, c))
                sd[pre + "mlp.fc1.bias"] = _T(np.zeros(4 * c))
                sd[pre + "mlp.fc2.weight"] = _T(rand(rng, c, 4 * c))
                sd[pre + "mlp.fc2.bias"] = _T(np.zeros(c))
            if i < len(depths) - 1:
                sd[f"layers.{i}.downsample.norm.weight"] = _T(np.ones(4 * c))
                sd[f"layers.{i}.downsample.norm.bias"] = _T(np.zeros(4 * c))
                sd[f"layers.{i}.downsample.reduction.weight"] = _T(
                    rand(rng, 2 * c, 4 * c))
        c_last = embed * 2 ** (len(depths) - 1)
        sd["norm.weight"] = _T(np.ones(c_last))
        sd["norm.bias"] = _T(np.zeros(c_last))
        return {"model": sd} if with_wrapper else sd

    def test_swin_roundtrip(self, rng):
        from arco_tpu.models.swin_unet import SwinUnet
        depths, heads, ws = (1, 1, 1, 1), (2, 2, 2, 2), 4
        m = SwinUnet(num_classes=4, in_chns=1, embed_dim=24, depths=depths,
                     num_heads=heads, window_size=ws)
        x = jnp.ones((1, 32, 32, 1))
        variables = m.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x,
                           train=False)
        sd = self._make_sd(rng, depths=depths, heads=heads, ws=ws)
        sub = convert_swin_state_dict(sd, depths=depths, window_size=ws,
                                      img_size=32)
        merged = deep_merge(dict(variables["params"]), sub)
        # encoder AND mirrored decoder blocks covered
        assert "SwinBlock_0" in sub and "SwinBlock_4" in sub
        # bias table resized from window 7 -> the stage-0 effective window
        assert sub["SwinBlock_0"]["WindowAttention_0"][
            "relative_position_bias_table"].shape == ((2 * ws - 1) ** 2, 2)
        logits, _, _ = m.apply({"params": merged}, x, train=False,
                               rngs={"dropout": jax.random.PRNGKey(0)})
        assert logits.shape == (1, 32, 32, 4)

    def test_merge_perm_consistency(self, rng):
        """PatchMerging import permutes torch's [x0,x1,x2,x3] concat into
        our [x0,x2,x1,x3] reshape order: applying the imported reduction
        to our concat order must equal torch applying its weight to torch
        order."""
        c = 4
        W = rand(rng, 2 * c, 4 * c)          # torch [out, in]
        from arco_tpu.compat.pretrained import _perm4c
        ours = _perm4c(W.T, axis=0)          # flax [in, out]
        x0, x1, x2, x3 = (rand(rng, c), rand(rng, c), rand(rng, c),
                          rand(rng, c))
        torch_in = np.concatenate([x0, x1, x2, x3])
        ours_in = np.concatenate([x0, x2, x1, x3])
        np.testing.assert_allclose(torch_in @ W.T, ours_in @ ours,
                                   rtol=1e-5)


class TestEfficientNetImport:
    def test_b3_roundtrip(self, rng):
        from arco_tpu.models.efficientunet import (B0_BLOCKS, EffiUNet,
                                                   _round_filters,
                                                   _round_repeats)
        width, depth = 1.2, 1.4
        sd = {}
        stem = _round_filters(32, width)
        sd["_conv_stem.weight"] = _T(rand(rng, stem, 3, 3, 3))
        for n, ch in (("_bn0", stem),):
            sd[f"{n}.weight"] = _T(np.ones(ch))
            sd[f"{n}.bias"] = _T(np.zeros(ch))
            sd[f"{n}.running_mean"] = _T(np.zeros(ch))
            sd[f"{n}.running_var"] = _T(np.ones(ch))
        i = 0
        cin = stem
        for (e, c, r, s, k) in B0_BLOCKS:
            cout = _round_filters(c, width)
            for j in range(_round_repeats(r, depth)):
                pre = f"_blocks.{i}"
                exp = cin * e
                if e != 1:
                    sd[f"{pre}._expand_conv.weight"] = _T(
                        rand(rng, exp, cin, 1, 1))
                    for nm, ch in ((f"{pre}._bn0", exp),):
                        sd[f"{nm}.weight"] = _T(np.ones(ch))
                        sd[f"{nm}.bias"] = _T(np.zeros(ch))
                        sd[f"{nm}.running_mean"] = _T(np.zeros(ch))
                        sd[f"{nm}.running_var"] = _T(np.ones(ch))
                sd[f"{pre}._depthwise_conv.weight"] = _T(
                    rand(rng, exp, 1, k, k))
                se = max(1, int(cin * 0.25))
                sd[f"{pre}._se_reduce.weight"] = _T(rand(rng, se, exp, 1, 1))
                sd[f"{pre}._se_reduce.bias"] = _T(np.zeros(se))
                sd[f"{pre}._se_expand.weight"] = _T(rand(rng, exp, se, 1, 1))
                sd[f"{pre}._se_expand.bias"] = _T(np.zeros(exp))
                sd[f"{pre}._project_conv.weight"] = _T(
                    rand(rng, cout, exp, 1, 1))
                for nm, ch in ((f"{pre}._bn1", exp), (f"{pre}._bn2", cout)):
                    sd[f"{nm}.weight"] = _T(np.ones(ch))
                    sd[f"{nm}.bias"] = _T(np.zeros(ch))
                    sd[f"{nm}.running_mean"] = _T(np.zeros(ch))
                    sd[f"{nm}.running_var"] = _T(np.ones(ch))
                cin = cout
                i += 1

        pp, ss = convert_efficientnet_state_dict(sd, width, depth,
                                                 in_chns=1)
        m = EffiUNet(num_classes=4, in_chns=1)
        x = jnp.ones((1, 64, 64, 1))
        variables = m.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x,
                           train=False)
        merged_p = deep_merge(dict(variables["params"]),
                              {"EfficientNetEncoder_0": pp})
        merged_s = deep_merge(dict(variables["batch_stats"]),
                              {"EfficientNetEncoder_0": ss})
        logits, _, _ = m.apply(
            {"params": merged_p, "batch_stats": merged_s}, x, train=False,
            rngs={"dropout": jax.random.PRNGKey(0)})
        assert logits.shape == (1, 64, 64, 4)


class TestDeepMerge:
    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError):
            deep_merge({"a": np.zeros((2, 2))}, {"a": np.zeros((3, 3))})

    def test_unknown_key_raises(self):
        with pytest.raises(KeyError):
            deep_merge({"a": np.zeros(2)}, {"b": np.zeros(2)})
