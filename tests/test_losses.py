"""Golden-value tests for losses against the reference's torch
implementations (imported from the read-only reference mount)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arco_tpu.losses import (compute_unsupervised_loss, cross_entropy,
                             dice_loss, equivariance_loss, kld_batchmean,
                             revisiting_loss)
from arco_tpu.losses import contrastive
from arco_tpu.utils import ramps

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

REF = "/root/reference/code"


class TestCrossEntropy:
    def test_matches_torch_with_ignore(self, rng):
        logits = rng.randn(4, 8, 8, 3).astype(np.float32)
        labels = rng.randint(-1, 3, size=(4, 8, 8))
        ours = cross_entropy(jnp.array(logits), jnp.array(labels),
                             ignore_index=-1)
        theirs = F.cross_entropy(
            torch.from_numpy(logits).permute(0, 3, 1, 2),
            torch.from_numpy(labels).long(), ignore_index=-1)
        np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)

    def test_reduction_none(self, rng):
        logits = rng.randn(2, 4, 4, 3).astype(np.float32)
        labels = rng.randint(0, 3, size=(2, 4, 4))
        ours = cross_entropy(jnp.array(logits), jnp.array(labels),
                             reduction="none")
        theirs = F.cross_entropy(torch.from_numpy(logits).permute(0, 3, 1, 2),
                                 torch.from_numpy(labels).long(),
                                 reduction="none").numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4)


class TestDiceLoss:
    def test_matches_reference(self, rng):
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "ref_losses", f"{REF}/utils/losses.py")
        ref_losses = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_losses)
        DiceLoss = ref_losses.DiceLoss
        probs = rng.rand(2, 16, 16, 4).astype(np.float32)
        probs = probs / probs.sum(-1, keepdims=True)
        labels = rng.randint(0, 4, size=(2, 16, 16))
        ours = dice_loss(jnp.array(probs), jnp.array(labels), 4)
        ref = DiceLoss(4)(torch.from_numpy(probs).permute(0, 3, 1, 2),
                          torch.from_numpy(labels)[:, None].float())
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


class TestKLD:
    def test_matches_torch_batchmean(self, rng):
        s = rng.randn(6, 128).astype(np.float32)
        t = rng.randn(6, 128).astype(np.float32)
        ours = kld_batchmean(jnp.array(s), jnp.array(t))
        theirs = F.kl_div(F.log_softmax(torch.from_numpy(s), dim=1),
                          F.softmax(torch.from_numpy(t), dim=1),
                          reduction="batchmean")
        np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-4)


class TestUnsupLoss:
    def test_matches_reference_formula(self, rng):
        predict = rng.randn(4, 16, 16, 4).astype(np.float32)
        target = rng.randint(-1, 4, size=(4, 16, 16))
        logits = rng.rand(4, 16, 16).astype(np.float32)
        ours = compute_unsupervised_loss(jnp.array(predict), jnp.array(target),
                                         jnp.array(logits), 0.7)
        # reference formula (train_arco_2d.py:482-489)
        pt = torch.from_numpy(predict).permute(0, 3, 1, 2)
        tt = torch.from_numpy(target).long()
        lt = torch.from_numpy(logits)
        valid = (tt >= 0).float()
        weighting = lt.view(4, -1).ge(0.7).sum(-1) / valid.view(4, -1).sum(-1)
        loss = F.cross_entropy(pt, tt, reduction="none", ignore_index=-1)
        ref = torch.mean(torch.masked_select(
            weighting[:, None, None] * loss, loss > 0))
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


class TestRevisitingLoss:
    def test_matches_reference_formula(self, rng):
        pool = rng.randn(8, 64).astype(np.float32)
        pool = pool / np.linalg.norm(pool, axis=1, keepdims=True)
        rep_u = rng.randn(4, 64).astype(np.float32)
        rep_t = rng.randn(4, 64).astype(np.float32)
        ours = revisiting_loss(jnp.array(pool), jnp.array(rep_u),
                               jnp.array(rep_t), topk=3)
        # reference formula (train_arco_2d.py:126-136)
        ru = F.normalize(torch.from_numpy(rep_u), dim=-1)
        rt = F.normalize(torch.from_numpy(rep_t), dim=-1)
        pl = torch.from_numpy(pool)
        dist_t = 2 - 2 * torch.einsum("bc,kc->bk", ru, pl)
        dist_q = 2 - 2 * torch.einsum("bc,kc->bk", rt, pl)
        _, nn_index = dist_t.topk(3, dim=1, largest=False)
        ref = (torch.gather(dist_q, 1, nn_index).sum(1) / 3).mean()
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


class TestEquivarianceLoss:
    def test_matches_reference_formula(self, rng):
        pred = rng.randn(2, 8, 8, 4).astype(np.float32)
        pred_org = rng.randn(2, 8, 8, 4).astype(np.float32)
        mask = (rng.rand(2, 8, 8, 1) > 0.4).astype(np.float32)
        ours = equivariance_loss(jnp.array(pred), jnp.array(pred_org),
                                 jnp.array(mask))
        kl = torch.nn.KLDivLoss(reduction="none")
        pt = torch.from_numpy(pred).permute(0, 3, 1, 2)
        ot = torch.from_numpy(pred_org).permute(0, 3, 1, 2)
        mt = torch.from_numpy(mask).permute(0, 3, 1, 2)
        le = kl(F.log_softmax(pt, dim=1), F.softmax(ot, dim=1))
        le = (le * mt).flatten(1).sum(1) / (mt.flatten(1).sum(1) + 1e-7)
        np.testing.assert_allclose(float(ours), float(le.mean()), rtol=1e-4)


class TestRamps:
    def test_sigmoid_rampup_matches_reference(self):
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "ref_ramps", f"{REF}/utils/ramps.py")
        ref_ramps = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_ramps)
        for cur in [0, 10, 100, 200, 300]:
            np.testing.assert_allclose(
                float(ramps.sigmoid_rampup(cur, 200.0)),
                ref_ramps.sigmoid_rampup(cur, 200.0), rtol=1e-4)


class TestContrastive:
    def _setup(self, seed=0, b=4, hw=16, k=4, c=32):
        rng = np.random.RandomState(seed)
        rep = rng.randn(b, hw, hw, c).astype(np.float32)
        rep_t = rng.randn(b, hw, hw, c).astype(np.float32)
        labels = rng.randint(0, k, size=(b, hw, hw))
        onehot = np.eye(k, dtype=np.float32)[labels]
        prob = rng.rand(b, hw, hw, k).astype(np.float32)
        prob /= prob.sum(-1, keepdims=True)
        is_labeled = np.array([True, True, False, False])
        label_l = onehot * is_labeled[:, None, None, None]
        low = np.ones((b, hw, hw), np.float32)
        high = np.ones((b, hw, hw), np.float32)
        return rep, rep_t, onehot, prob, is_labeled, label_l, low, high

    def test_runs_and_fills_bank(self):
        rep, rep_t, onehot, prob, is_lab, label_l, low, high = self._setup()
        bank = contrastive.create_memobank(4, 32, capacity=512,
                                           capacity_bg=1024)
        rank = contrastive.descending_rank(jnp.array(prob))
        new_bank, loss = contrastive.compute_contra_memobank_loss(
            jax.random.PRNGKey(0), jnp.array(rep), jnp.array(onehot),
            jnp.array(prob), rank, jnp.array(is_lab), jnp.array(label_l),
            jnp.array(low), jnp.array(high), jnp.array(rep_t), bank,
            num_queries=32, num_negatives=16, enqueue_per_class=64,
            low_rank=1, high_rank=4, current_class_threshold=0.0)
        assert np.isfinite(float(loss)) and float(loss) > 0
        assert int(new_bank.count.min()) > 0

    def test_zero_when_one_class(self):
        rep, rep_t, _, prob, is_lab, _, low, high = self._setup()
        onehot = np.zeros((4, 16, 16, 4), np.float32)
        onehot[..., 1] = 1.0  # single class present
        bank = contrastive.create_memobank(4, 32, capacity=512,
                                           capacity_bg=512)
        rank = contrastive.descending_rank(jnp.array(prob))
        _, loss = contrastive.compute_contra_memobank_loss(
            jax.random.PRNGKey(0), jnp.array(rep), jnp.array(onehot),
            jnp.array(prob), rank, jnp.array(is_lab), jnp.array(onehot * 0),
            jnp.array(low), jnp.array(high), jnp.array(rep_t), bank,
            num_queries=32, num_negatives=16, enqueue_per_class=64,
            current_class_threshold=0.0)
        assert float(loss) == 0.0

    def test_two_class_default_ranks_degenerate_reco(self):
        """With num_classes=2 and the reference's hardcoded low_rank=3 /
        high_rank=20 (loss_helper_3d.py:319), the negative mask is provably
        empty: unlabeled pixels need class rank in [3, 20) (impossible with
        2 classes), and labeled pixels need onehot_i > 0 AND
        label_l[..., i] == 0 simultaneously (contradiction). The banks
        therefore never fill on LA (2-class) — BUT the reference's reco is
        NOT zero: each bank holds its single init row (zeros in 2D,
        train_arco_2d.py:152; randn in 3D, train_arco_3d.py:149), the
        `shape[0] > 0` guard passes (loss_helper.py:592-595 never fires),
        and the loss is the degenerate CE of the anchors against that one
        row repeated as all negatives. (Round 3 pinned reco ≡ 0 here —
        wrong; corrected round 4, proven on the reference's own 5-D code in
        tests/test_reference_parity_3d.py.) With the zeros init row the
        value is analytic: every negative logit is exactly 0."""
        rng = np.random.RandomState(7)
        b, hw, k, c = 4, 16, 2, 32
        rep = rng.randn(b, hw, hw, c).astype(np.float32)
        rep_t = rng.randn(b, hw, hw, c).astype(np.float32)
        labels = rng.randint(0, k, size=(b, hw, hw))
        onehot = np.eye(k, dtype=np.float32)[labels]
        prob = rng.rand(b, hw, hw, k).astype(np.float32)
        prob /= prob.sum(-1, keepdims=True)
        is_lab = np.array([True, True, False, False])
        label_l = onehot * is_lab[:, None, None, None]
        low = np.ones((b, hw, hw), np.float32)
        high = np.ones((b, hw, hw), np.float32)
        num_q, num_n, temp = 32, 16, 0.5
        bank = contrastive.create_memobank(k, c, capacity=512,
                                           capacity_bg=1024)
        rank = contrastive.descending_rank(jnp.array(prob))
        new_bank, loss = contrastive.compute_contra_memobank_loss(
            jax.random.PRNGKey(0), jnp.array(rep), jnp.array(onehot),
            jnp.array(prob), rank, jnp.array(is_lab), jnp.array(label_l),
            jnp.array(low), jnp.array(high), jnp.array(rep_t), bank,
            num_queries=num_q, num_negatives=num_n, temp=temp,
            enqueue_per_class=64, low_rank=3, high_rank=20,
            current_class_threshold=0.3)
        # nothing enqueued beyond the init row
        assert int(new_bank.count.max()) == 1
        assert float(loss) > 0.0
        # analytic check: negatives are all the zeros row -> logit 0; the
        # positive logit is cos(anchor, proto)/temp for the sampled anchors.
        # Upper/lower bound the CE by the extreme cosines (+-1/temp).
        hi = float(np.log(np.exp(-1 / temp) + num_n) + 1 / temp)
        lo = float(np.log(np.exp(1 / temp) + num_n) - 1 / temp)
        assert lo <= float(loss) <= hi

    def test_descending_rank_matches_torch_sort(self, rng):
        prob = rng.rand(2, 4, 4, 6).astype(np.float32)
        ours = np.asarray(contrastive.descending_rank(jnp.array(prob)))
        _, idx = torch.sort(torch.from_numpy(prob).permute(0, 3, 1, 2), 1,
                            True)
        # idx[b, r, y, x] = class at rank r -> invert to rank of class
        ref_rank = np.empty_like(ours)
        idx = idx.numpy()
        for r in range(6):
            cls = idx[:, r]          # [B, H, W] class id holding rank r
            np.put_along_axis(ref_rank, cls[..., None], r, axis=-1)
        np.testing.assert_array_equal(ours, ref_rank)

    def test_descending_rank_tie_order_and_fallback(self, rng):
        """The K^2 comparison-count fast path (K <= 32) must equal the
        stable argsort(argsort) construction INCLUDING tie order, and the
        large-K fallback must agree with it too."""
        prob = rng.rand(3, 5, 5, 8).astype(np.float32)
        prob[..., 2] = prob[..., 0]          # forced ties
        prob[..., 5] = prob[..., 0]
        fast = np.asarray(contrastive.descending_rank(jnp.array(prob)))
        order = jnp.argsort(-jnp.array(prob), axis=-1, stable=True)
        slow = np.asarray(jnp.argsort(order, axis=-1))
        np.testing.assert_array_equal(fast, slow)
        # every rank appears exactly once per pixel
        np.testing.assert_array_equal(np.sort(fast, -1),
                                      np.broadcast_to(np.arange(8),
                                                      fast.shape))

    def test_sampled_infonce_matches_direct(self, rng):
        q, n, c, cap = 8, 4, 16, 64
        anchor = rng.randn(q, c).astype(np.float32)
        proto = rng.randn(c).astype(np.float32)
        bank = rng.randn(cap, c).astype(np.float32)
        idx = rng.randint(0, cap, size=(q, n)).astype(np.int32)
        ours = contrastive.sampled_infonce(
            jnp.array(anchor), jnp.array(proto), jnp.array(bank),
            jnp.array(idx), temp=0.5)
        # direct torch computation (loss_helper_3d.py:497-506)
        at = torch.from_numpy(anchor)
        allf = torch.cat([torch.from_numpy(proto)[None].expand(q, 1, c),
                          torch.from_numpy(bank[idx])], dim=1)
        logits = torch.cosine_similarity(at[:, None], allf, dim=2)
        ref = F.cross_entropy(logits / 0.5, torch.zeros(q).long())
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)
