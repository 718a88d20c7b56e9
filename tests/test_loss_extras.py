"""Tests for the secondary loss library."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arco_tpu.losses import extras
from arco_tpu.losses.supervised import symmetric_mse_loss

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


class TestInfoNCE:
    def test_perfect_alignment_lower_loss(self, rng):
        q = rng.randn(8, 16).astype(np.float32)
        aligned = float(extras.info_nce(jnp.array(q), jnp.array(q)))
        shuffled = float(extras.info_nce(jnp.array(q),
                                         jnp.array(q[::-1].copy())))
        assert aligned < shuffled


class TestOhem:
    def test_keeps_hard_pixels(self, rng):
        logits = rng.randn(2, 8, 8, 3).astype(np.float32)
        labels = rng.randint(0, 3, size=(2, 8, 8))
        # min_kept = all -> equals plain CE over valid
        full = extras.ohem_cross_entropy(jnp.array(logits), jnp.array(labels),
                                         ignore_index=255, thresh=1.1,
                                         min_kept=2 * 8 * 8)
        ce = F.cross_entropy(torch.from_numpy(logits).permute(0, 3, 1, 2),
                             torch.from_numpy(labels).long())
        np.testing.assert_allclose(float(full), float(ce), rtol=1e-4)

    def test_small_min_kept_selects_hardest(self, rng):
        logits = rng.randn(1, 4, 4, 3).astype(np.float32)
        labels = rng.randint(0, 3, size=(1, 4, 4))
        hard = extras.ohem_cross_entropy(jnp.array(logits), jnp.array(labels),
                                         thresh=0.0, min_kept=4)
        full = extras.ohem_cross_entropy(jnp.array(logits), jnp.array(labels),
                                         thresh=1.1, min_kept=16)
        assert float(hard) >= float(full)


class TestSoftDice:
    def test_perfect_prediction(self):
        target = jax.nn.one_hot(jnp.array([[0, 1], [1, 0]]), 2)
        logits = (target * 2 - 1) * 20.0
        loss = extras.soft_dice_loss(logits, target)
        np.testing.assert_allclose(float(loss), -1.0, atol=1e-3)


class TestSupCon:
    def test_matches_torch_reference_impl(self, rng):
        """Compare against a direct torch transcription of Khosla et al."""
        feats = rng.randn(6, 2, 16).astype(np.float32)
        labels = rng.randint(0, 3, size=(6,))
        ours = float(extras.sup_con_loss(jnp.array(feats), jnp.array(labels),
                                         temperature=0.1))
        # torch direct computation (Khosla et al. canonical ordering)
        f = torch.from_numpy(feats)
        f = F.normalize(f, dim=-1)
        lt = torch.from_numpy(labels)
        b, v, c = f.shape
        feat = torch.cat(torch.unbind(f, dim=1), dim=0)
        mask = (lt.unsqueeze(0) == lt.unsqueeze(1)).float().repeat(v, v)
        logits = feat @ feat.T / 0.1
        logits = logits - logits.max(dim=1, keepdim=True)[0].detach()
        self_mask = 1 - torch.eye(b * v)
        mask = mask * self_mask
        exp_logits = logits.exp() * self_mask
        log_prob = logits - exp_logits.sum(1, keepdim=True).log()
        mlpp = (mask * log_prob).sum(1) / mask.sum(1).clamp(min=1e-12)
        # reference SupConLoss scales by temperature/base_temperature
        # (loss_helper_3d.py:1121-1192, base_temperature=0.07)
        ref = -(0.1 / 0.07) * mlpp.mean()
        np.testing.assert_allclose(ours, float(ref), rtol=1e-3)

    def test_local_con_runs(self, rng):
        feats = rng.randn(2, 2, 8, 16, 16).astype(np.float32)
        labels = rng.randint(0, 3, size=(2, 16, 16))
        out = extras.local_con_loss(jnp.array(feats), jnp.array(labels),
                                    stride=8)
        assert np.isfinite(float(out))


class TestReco:
    def test_runs_and_finite(self, rng):
        rep = rng.randn(2, 16, 16, 8).astype(np.float32)
        labels = rng.randint(0, 3, size=(2, 16, 16))
        onehot = np.eye(3, dtype=np.float32)[labels]
        prob = rng.rand(2, 16, 16, 3).astype(np.float32)
        prob /= prob.sum(-1, keepdims=True)
        mask = np.ones((2, 16, 16), np.float32)
        loss = extras.compute_reco_loss(
            jax.random.PRNGKey(0), jnp.array(rep), jnp.array(mask),
            jnp.array(prob), jnp.array(onehot), strong_threshold=1.0,
            num_queries=16, num_negatives=8)
        assert np.isfinite(float(loss)) and float(loss) > 0


class TestSymmetricMSE:
    def test_value(self, rng):
        a = rng.randn(4, 4).astype(np.float32)
        b = rng.randn(4, 4).astype(np.float32)
        np.testing.assert_allclose(
            float(symmetric_mse_loss(jnp.array(a), jnp.array(b))),
            np.mean((a - b) ** 2), rtol=1e-6)


class TestSupConSeg:
    def test_runs(self, rng):
        feats = rng.randn(2, 8, 8, 16).astype(np.float32)
        labels = rng.randint(0, 3, size=(2, 8, 8))
        loss = extras.sup_con_seg_loss(jnp.array(feats), jnp.array(labels),
                                       jax.random.PRNGKey(0),
                                       num_samples=16)
        assert np.isfinite(float(loss))
