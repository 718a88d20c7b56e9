"""COMPOSED-level parity: the reference's OWN torch code (cuda-shimmed onto
CPU via arco_tpu.compat.refbridge) against arco_tpu on identical weights and
inputs — not hand-derived formulas.

Three legs (VERDICT round 2, "Next round" item 1):
 (a) exact: every deterministic loss term, the fused-head pipeline on
     imported weights, a shared-TPS-warp equivariance leg, and a
     fully-pinned contrastive construction where the sampled indices cannot
     change the value (constant per-class features) so the reference's
     stratified draw and ours must agree to float tolerance;
 (b) statistical: the sampled contrastive loss over many RNG draws on
     identical banks, and memobank composition after live enqueues
     (the reference enqueues every matching pixel, loss_helper_3d.py:13-33;
     we enqueue a stratified sample — equivalence is distributional);
 (c) trajectory: scripts/reference_trajectory.py (reference train loop
     driven end-to-end on torch-CPU vs the arco_tpu trainer; slow —
     committed artifact, not a CI test).

Reference functions exercised here come straight from /root/reference/code:
train_arco_2d.{compute_unsupervised_loss,get_revisiting_loss,label_onehot},
loss_helper_3d.compute_contra_memobank_loss, model_2D.FeatureExtractor,
tps.rand_tps.RandTPS, utils.losses.DiceLoss.
"""

import numpy as np
import pytest

from arco_tpu.compat import refbridge as rb

pytestmark = pytest.mark.skipif(
    not rb.reference_available(), reason="reference tree not mounted")

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from arco_tpu.losses import consistency  # noqa: E402
from arco_tpu.losses import contrastive  # noqa: E402
from arco_tpu.losses.supervised import one_hot  # noqa: E402
from arco_tpu.train.arco2d import masked_percentiles  # noqa: E402

B_L, B_U, H, W, K, C = 2, 2, 16, 16, 4, 8


def _t2d():
    return rb.import_ref("train_arco_2d")


def _lh():
    return rb.import_ref("loss_helper_3d")


def _nchw(x):
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


class TestDeterministicTermsExact:
    """Leg (a): deterministic loss terms, reference code vs arco_tpu."""

    def test_compute_unsupervised_loss(self, rng):
        t2d = _t2d()
        pred = torch.tensor(rng.randn(B_U + 2, K, H, W).astype(np.float32))
        target = torch.tensor(
            rng.randint(-1, K, size=(B_U + 2, H, W)).astype(np.int64))
        logits = torch.tensor(
            rng.rand(B_U + 2, H, W).astype(np.float32))
        ref = t2d.compute_unsupervised_loss(pred, target, logits, 0.6)
        mine = consistency.compute_unsupervised_loss(
            _nchw(pred), jnp.asarray(target.numpy()),
            jnp.asarray(logits.numpy()), 0.6)
        np.testing.assert_allclose(float(mine), float(ref), rtol=2e-5)

    def test_revisiting_loss(self, rng):
        t2d = _t2d()
        kp, cf = 12, 6
        pool = torch.tensor(rng.randn(kp, cf * H * W).astype(np.float32))
        pool = torch.nn.functional.normalize(pool, dim=1)
        rep_u = torch.tensor(rng.randn(B_U, cf, H, W).astype(np.float32))
        rep_t = torch.tensor(rng.randn(B_U, cf, H, W).astype(np.float32))
        ref = t2d.get_revisiting_loss(pool, rep_u, rep_t, topk=5)
        pool_native = jnp.asarray(
            pool.numpy().reshape(kp, cf, H, W).transpose(0, 2, 3, 1))
        mine = consistency.revisiting_loss(pool_native, _nchw(rep_u),
                                           _nchw(rep_t), topk=5)
        np.testing.assert_allclose(float(mine), float(ref),
                                   rtol=1e-4, atol=1e-6)

    def test_equivariance_loss(self, rng):
        """The exact 5 torch lines from train_arco_2d.py:419-423 vs
        equivariance_loss, on shared (already-warped) tensors."""
        import torch.nn.functional as F
        pred_tps = torch.tensor(rng.randn(B_L + B_U, K, H, W)
                                .astype(np.float32))
        pred_org = torch.tensor(rng.randn(B_L + B_U, K, H, W)
                                .astype(np.float32))
        mask = torch.tensor(
            (rng.rand(B_L + B_U, 1, H, W) > 0.3).astype(np.float32)) * 0.9
        kl = torch.nn.KLDivLoss(reduction="none")
        le = kl(F.log_softmax(pred_tps, dim=1), F.softmax(pred_org, dim=1))
        le = (le * mask).flatten(1).sum(1) / (mask.flatten(1).sum(1) + 1e-7)
        ref = le.mean()
        mine = consistency.equivariance_loss(
            _nchw(pred_tps), _nchw(pred_org), _nchw(mask))
        np.testing.assert_allclose(float(mine), float(ref), rtol=2e-5)

    def test_entropy_percentile_split(self, rng):
        """The host np.percentile split (train_arco_2d.py:359-371) vs the
        device masked percentile — identical thresholds AND masks."""
        entropy = rng.rand(B_U, H, W).astype(np.float32)
        valid = rng.rand(B_U, H, W) > 0.25
        alpha_t = 13.7
        low_ref = np.percentile(entropy[valid].flatten(), alpha_t)
        high_ref = np.percentile(entropy[valid].flatten(), 100 - alpha_t)
        low, high = masked_percentiles(jnp.asarray(entropy),
                                       jnp.asarray(valid),
                                       [alpha_t, 100 - alpha_t])
        np.testing.assert_allclose(float(low), low_ref, rtol=1e-5)
        np.testing.assert_allclose(float(high), high_ref, rtol=1e-5)
        np.testing.assert_array_equal(
            np.asarray((jnp.asarray(entropy) <= low)) & valid,
            (entropy <= low_ref) & valid)

    def test_shared_tps_warp(self, rng):
        """Reference RandTPS grid applied by BOTH grid samplers: warp
        parity on the composed grid (train_arco_2d.py:412-418)."""
        ref_tps_mod = rb.import_ref("tps.rand_tps")
        torch.manual_seed(7)
        import random as pyrandom
        pyrandom.seed(7)
        np.random.seed(7)
        tps = ref_tps_mod.RandTPS(W, H, batch_size=B_L + B_U, sigma=0.05,
                                  random_mirror=True, random_scale=(0.8, 1.2),
                                  mode="affine")
        x = torch.tensor(rng.randn(B_L + B_U, 3, H, W).astype(np.float32))
        ref = tps(x, padding_mode="zeros")

        from arco_tpu.augment.tps import RandTPS as MyTPS
        mine_tps = MyTPS(W, H, batch_size=B_L + B_U)
        grid = jnp.asarray(tps.grid.detach().numpy())
        mine = mine_tps.apply(_nchw(x), grid, padding_mode="zeros")
        np.testing.assert_allclose(np.asarray(mine),
                                   ref.detach().numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-5)


class TestFusedHeadsExact:
    """Leg (a): reference FeatureExtractor + q_representation weights
    imported into the flax heads — composed pipeline parity."""

    def test_feature_extractor_import(self, rng):
        m2 = rb.import_ref("model_2D")
        from arco_tpu.compat.torch_import import \
            convert_feature_extractor_state_dict
        from arco_tpu.models.heads import FeatureExtractor

        fea_dim = [32, 16, 8, 8, 8]
        torch.manual_seed(3)
        ref_fe = m2.FeatureExtractor(fea_dim=fea_dim, output_dim=24)
        sizes = [2, 4, 8, 16, 16]
        fmaps_t = [torch.tensor(rng.randn(B_L, c, s, s).astype(np.float32))
                   for c, s in zip(fea_dim, sizes)]
        ref = ref_fe(fmaps_t)

        fe = FeatureExtractor(fea_dim=tuple(fea_dim), output_dim=24)
        params = convert_feature_extractor_state_dict(ref_fe.state_dict())
        mine = fe.apply({"params": params}, [_nchw(f) for f in fmaps_t])
        np.testing.assert_allclose(
            np.asarray(mine), ref.detach().numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-5)

    def test_q_representation_import(self, rng):
        import torch.nn as nn
        from arco_tpu.compat.torch_import import \
            convert_q_representation_state_dict
        from arco_tpu.models.heads import QRepresentation

        torch.manual_seed(4)
        ch = 24
        ref_qr = nn.Sequential(
            nn.Conv2d(ch, ch, kernel_size=1, bias=False),
            nn.Conv2d(ch, ch, kernel_size=1, bias=False))
        x = torch.tensor(rng.randn(B_L, ch, H, W).astype(np.float32))
        ref = ref_qr(x)
        qr = QRepresentation(channels=ch)
        params = convert_q_representation_state_dict(ref_qr.state_dict())
        mine = qr.apply({"params": params}, _nchw(x))
        np.testing.assert_allclose(
            np.asarray(mine), ref.detach().numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-5)


def _pinned_contrastive_inputs():
    """Construction where the sampled indices cannot change the loss value:
    within each class, every anchor candidate is the same vector w_c, every
    enqueued negative the same v_c, and the prototype exactly u_c — so the
    reference's grid sampler and our stratified sampler must produce the
    SAME loss (cos(w,u)=0.8 positive, cos(w,v)=0.96 negatives), per class
    and in total. Sensitivity: a wrong rank window / mask / threshold pulls
    differently-featured pixels into the sets and moves the value."""
    b, cls = B_L + B_U, K
    band = H // cls
    labels = np.zeros((b, H, W), np.int64)
    for c in range(cls):
        labels[:, c * band:(c + 1) * band, :] = c
    low_mask = np.zeros((b, H, W), np.float32)
    low_mask[:, :, : W // 2] = 1.0          # anchor/proto half
    high_mask = 1.0 - low_mask              # negative half

    u = np.eye(C, dtype=np.float32)[:cls]                      # protos
    v = np.zeros((cls, C), np.float32)
    w = np.zeros((cls, C), np.float32)
    for c in range(cls):
        v[c, c], v[c, (c + 4) % C] = 0.6, 0.8                  # negatives
        w[c, c], w[c, (c + 4) % C] = 0.8, 0.6                  # anchors

    rep_teacher = np.zeros((b, H, W, C), np.float32)
    rep_student = np.zeros((b, H, W, C), np.float32)
    prob = np.zeros((b, H, W, cls), np.float32)
    other_low = [0.25, 0.2, 0.15]    # rank(c)=0 at anchor pixels
    other_high = [0.5, 0.25, 0.15]   # rank(c)=3 at negative pixels
    for c in range(cls):
        rows = slice(c * band, (c + 1) * band)
        rep_teacher[:, rows, : W // 2] = u[c] * 2.0
        rep_teacher[:, rows, W // 2:] = v[c] * 3.0
        rep_student[:, rows, :] = w[c] * 1.5
        others = [k for k in range(cls) if k != c]
        prob[:, rows, : W // 2, c] = 0.4
        prob[:, rows, W // 2:, c] = 0.1
        for o, p_lo, p_hi in zip(others, other_low, other_high):
            prob[:, rows, : W // 2, o] = p_lo
            prob[:, rows, W // 2:, o] = p_hi
    return labels, low_mask, high_mask, rep_student, rep_teacher, prob


class TestContrastivePinnedExact:
    """Leg (a): compute_contra_memobank_loss, reference vs arco_tpu, exact
    under the pinned construction (plus the analytic value)."""

    NUM_Q, NUM_N, CAP = 16, 8, 64

    def _expected(self):
        temp = 0.5
        s_p, s_n = 0.8 / temp, 0.96 / temp
        return float(np.log(np.exp(s_p) + self.NUM_N * np.exp(s_n)) - s_p)

    def test_reference_value(self):
        lh = _lh()
        labels, low, high, rep_s, rep_t, prob = _pinned_contrastive_inputs()
        torch.manual_seed(0)
        import random as pyrandom
        pyrandom.seed(0)

        onehot = np.eye(K, dtype=np.int64)[labels]              # [B,H,W,K]
        onehot = onehot.transpose(0, 3, 1, 2)
        label_l = torch.tensor(onehot[:B_L])
        label_u = torch.tensor(onehot[B_L:])
        prob_t = torch.tensor(prob.transpose(0, 3, 1, 2))
        memobank = [[torch.zeros(1, C)] for _ in range(K)]
        ptrs = [torch.zeros(1, dtype=torch.long) for _ in range(K)]
        sizes = [self.CAP] * K
        _, reco = lh.compute_contra_memobank_loss(
            torch.tensor(rep_s.transpose(0, 3, 1, 2)),
            label_l, label_u, prob_t[:B_L], prob_t[B_L:],
            torch.tensor(low.transpose(0, 1, 2)[:, None]),
            torch.tensor(high[:, None]),
            memobank, ptrs, sizes,
            torch.tensor(rep_t.transpose(0, 3, 1, 2)),
            delta_n=1.0, func="smc",
            num_queries=self.NUM_Q, num_negatives=self.NUM_N, temp=0.5)
        np.testing.assert_allclose(float(reco), self._expected(), rtol=1e-5)
        # the reference enqueued every negative pixel and trimmed to CAP
        for c in range(K):
            assert memobank[c][0].shape[0] == self.CAP

    def test_arco_matches_reference_exactly(self):
        labels, low, high, rep_s, rep_t, prob = _pinned_contrastive_inputs()
        onehot_all = one_hot(jnp.asarray(labels), K)
        label_l_onehot = jnp.concatenate(
            [onehot_all[:B_L], jnp.zeros_like(onehot_all[B_L:])], axis=0)
        prob_all = jnp.asarray(prob)
        rank_all = contrastive.descending_rank(prob_all)
        is_labeled = jnp.array([True] * B_L + [False] * B_U)
        bank = contrastive.create_memobank(K, C, capacity=self.CAP,
                                           capacity_bg=self.CAP)
        new_bank, reco = contrastive.compute_contra_memobank_loss(
            jax.random.PRNGKey(0), jnp.asarray(rep_s), onehot_all, prob_all,
            rank_all, is_labeled, label_l_onehot, jnp.asarray(low),
            jnp.asarray(high), jnp.asarray(rep_t), bank,
            delta_n=1.0, func="smc", num_queries=self.NUM_Q,
            num_negatives=self.NUM_N, temp=0.5,
            enqueue_per_class=self.CAP)
        np.testing.assert_allclose(float(reco), self._expected(), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(new_bank.count), self.CAP)

    def test_degenerate_single_class_returns_zero(self):
        """<2 valid classes -> 0 on both sides (loss_helper_3d.py:417-425)."""
        lh = _lh()
        labels = np.zeros((B_L + B_U, H, W), np.int64)
        prob = np.full((B_L + B_U, H, W, K), 1.0 / K, np.float32)
        prob[..., 0] = 0.7
        prob[..., 1:] = 0.1
        onehot = np.eye(K, dtype=np.int64)[labels].transpose(0, 3, 1, 2)
        memobank = [[torch.zeros(1, C)] for _ in range(K)]
        ptrs = [torch.zeros(1, dtype=torch.long) for _ in range(K)]
        ones = torch.ones(B_L + B_U, 1, H, W)
        rep = torch.randn(B_L + B_U, C, H, W)
        _, reco_ref = lh.compute_contra_memobank_loss(
            rep, torch.tensor(onehot[:B_L]), torch.tensor(onehot[B_L:]),
            torch.tensor(prob.transpose(0, 3, 1, 2))[:B_L],
            torch.tensor(prob.transpose(0, 3, 1, 2))[B_L:],
            ones, ones, memobank, ptrs, [64] * K, rep.clone(),
            delta_n=1.0, func="smc", num_queries=8, num_negatives=4)
        assert float(reco_ref) == 0.0

        onehot_j = one_hot(jnp.asarray(labels), K)
        prob_j = jnp.asarray(prob)
        bank = contrastive.create_memobank(K, C, capacity=64, capacity_bg=64)
        _, reco = contrastive.compute_contra_memobank_loss(
            jax.random.PRNGKey(1), jnp.asarray(np.asarray(rep.numpy())
                                               .transpose(0, 2, 3, 1)),
            onehot_j, prob_j, contrastive.descending_rank(prob_j),
            jnp.array([True] * B_L + [False] * B_U),
            jnp.concatenate([onehot_j[:B_L],
                             jnp.zeros_like(onehot_j[B_L:])], 0),
            jnp.ones((B_L + B_U, H, W)), jnp.ones((B_L + B_U, H, W)),
            jnp.asarray(np.asarray(rep.numpy()).transpose(0, 2, 3, 1)), bank,
            delta_n=1.0, func="smc", num_queries=8, num_negatives=4,
            enqueue_per_class=16)
        assert float(reco) == 0.0


def _random_contrastive_case(seed):
    """Random reps/probs with all classes valid, for the statistical leg."""
    r = np.random.RandomState(seed)
    b = B_L + B_U
    labels = r.randint(0, K, size=(b, H, W)).astype(np.int64)
    rep_s = r.randn(b, H, W, C).astype(np.float32)
    rep_t = r.randn(b, H, W, C).astype(np.float32)
    logits = r.randn(b, H, W, K).astype(np.float32)
    prob = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    low = (r.rand(b, H, W) > 0.4).astype(np.float32)
    high = (r.rand(b, H, W) > 0.4).astype(np.float32)
    return labels, low, high, rep_s, rep_t, prob


def _prefill_rows(seed):
    r = np.random.RandomState(1000 + seed)
    rows = r.randn(K, 48, C).astype(np.float32)
    return rows / np.linalg.norm(rows, axis=-1, keepdims=True)


class TestContrastiveStatistical:
    """Leg (b): sampled loss equivalence over many draws on IDENTICAL
    pre-filled banks (delta_n=0 disables enqueue on both sides so the banks
    stay identical through the call)."""

    M = 24
    NUM_Q, NUM_N = 32, 16

    def _ref_losses(self, case_seed):
        lh = _lh()
        labels, low, high, rep_s, rep_t, prob = \
            _random_contrastive_case(case_seed)
        rows = _prefill_rows(case_seed)
        onehot = np.eye(K, dtype=np.int64)[labels].transpose(0, 3, 1, 2)
        out = []
        import random as pyrandom
        for m in range(self.M):
            torch.manual_seed(m)
            pyrandom.seed(m)
            memobank = [[torch.tensor(rows[c])] for c in range(K)]
            ptrs = [torch.zeros(1, dtype=torch.long) for _ in range(K)]
            _, reco = lh.compute_contra_memobank_loss(
                torch.tensor(rep_s.transpose(0, 3, 1, 2)),
                torch.tensor(onehot[:B_L]), torch.tensor(onehot[B_L:]),
                torch.tensor(prob.transpose(0, 3, 1, 2))[:B_L],
                torch.tensor(prob.transpose(0, 3, 1, 2))[B_L:],
                torch.tensor(low[:, None]), torch.tensor(high[:, None]),
                memobank, ptrs, [48] * K,
                torch.tensor(rep_t.transpose(0, 3, 1, 2)),
                delta_n=0.0, func="smc",
                num_queries=self.NUM_Q, num_negatives=self.NUM_N, temp=0.5)
            out.append(float(reco))
        return np.asarray(out)

    def _arco_losses(self, case_seed):
        labels, low, high, rep_s, rep_t, prob = \
            _random_contrastive_case(case_seed)
        rows = _prefill_rows(case_seed)
        onehot_all = one_hot(jnp.asarray(labels), K)
        prob_all = jnp.asarray(prob)
        rank_all = contrastive.descending_rank(prob_all)
        is_labeled = jnp.array([True] * B_L + [False] * B_U)
        label_l_onehot = jnp.concatenate(
            [onehot_all[:B_L], jnp.zeros_like(onehot_all[B_L:])], axis=0)
        bank = contrastive.create_memobank(K, C, capacity=48, capacity_bg=48)
        bank = bank._replace(data=jnp.asarray(rows),
                             count=jnp.full((K,), 48, jnp.int32))
        fn = jax.jit(lambda key: contrastive.compute_contra_memobank_loss(
            key, jnp.asarray(rep_s), onehot_all, prob_all, rank_all,
            is_labeled, label_l_onehot, jnp.asarray(low), jnp.asarray(high),
            jnp.asarray(rep_t), bank, delta_n=0.0, func="smc",
            num_queries=self.NUM_Q, num_negatives=self.NUM_N, temp=0.5,
            enqueue_per_class=16)[1])
        return np.asarray([float(fn(jax.random.PRNGKey(m)))
                           for m in range(self.M)])

    def test_sampled_loss_means_agree(self):
        ref = self._ref_losses(0)
        mine = self._arco_losses(0)
        se = np.sqrt(ref.var() / self.M + mine.var() / self.M)
        assert abs(ref.mean() - mine.mean()) < max(4 * se, 0.02), \
            f"ref {ref.mean():.4f}±{ref.std():.4f} vs " \
            f"arco {mine.mean():.4f}±{mine.std():.4f}"

    def test_bank_composition_statistics(self):
        """Live enqueue path: run several steps with fresh reps; the
        normalized per-class bank means must align (the reference pushes
        every matching pixel; we push a stratified sample)."""
        lh = _lh()
        steps = 6
        import random as pyrandom
        torch.manual_seed(0)
        pyrandom.seed(0)
        memobank = [[torch.zeros(1, C)] for _ in range(K)]
        ptrs = [torch.zeros(1, dtype=torch.long) for _ in range(K)]
        bank = contrastive.create_memobank(K, C, capacity=512,
                                           capacity_bg=512)
        key = jax.random.PRNGKey(0)
        for s in range(steps):
            labels, low, high, rep_s, rep_t, prob = \
                _random_contrastive_case(50 + s)
            onehot = np.eye(K, dtype=np.int64)[labels].transpose(0, 3, 1, 2)
            lh.compute_contra_memobank_loss(
                torch.tensor(rep_s.transpose(0, 3, 1, 2)),
                torch.tensor(onehot[:B_L]), torch.tensor(onehot[B_L:]),
                torch.tensor(prob.transpose(0, 3, 1, 2))[:B_L],
                torch.tensor(prob.transpose(0, 3, 1, 2))[B_L:],
                torch.tensor(low[:, None]), torch.tensor(high[:, None]),
                memobank, ptrs, [512] * K,
                torch.tensor(rep_t.transpose(0, 3, 1, 2)),
                delta_n=1.0, func="smc", num_queries=16, num_negatives=8)

            onehot_all = one_hot(jnp.asarray(labels), K)
            prob_all = jnp.asarray(prob)
            key, sub = jax.random.split(key)
            bank, _ = contrastive.compute_contra_memobank_loss(
                sub, jnp.asarray(rep_s), onehot_all, prob_all,
                contrastive.descending_rank(prob_all),
                jnp.array([True] * B_L + [False] * B_U),
                jnp.concatenate([onehot_all[:B_L],
                                 jnp.zeros_like(onehot_all[B_L:])], 0),
                jnp.asarray(low), jnp.asarray(high), jnp.asarray(rep_t),
                bank, delta_n=1.0, func="smc", num_queries=16,
                num_negatives=8, enqueue_per_class=64)

        for c in range(K):
            ref_rows = memobank[c][0].numpy()
            ref_rows = ref_rows[np.abs(ref_rows).sum(1) > 0]  # drop init row
            ref_rows = ref_rows / np.linalg.norm(ref_rows, axis=1,
                                                 keepdims=True)
            n = int(bank.count[c])
            my_rows = np.asarray(bank.data[c][:n])
            assert n >= 64 * steps * 0.9
            # per-dimension z-test on the key means: both banks sample the
            # same negative-pixel population, so the means must agree
            # within the two-sample noise bound
            mu_r, mu_m = ref_rows.mean(0), my_rows.mean(0)
            se = np.sqrt(ref_rows.var(0) / len(ref_rows)
                         + my_rows.var(0) / len(my_rows))
            z = np.abs(mu_r - mu_m) / (se + 1e-12)
            assert z.max() < 5.0, \
                f"class {c}: bank mean z={z.max():.2f} (mu_r={mu_r}, " \
                f"mu_m={mu_m})"
            np.testing.assert_allclose(
                np.linalg.norm(ref_rows, axis=1).mean(), 1.0, rtol=1e-5)


class TestComposedStepParity:
    """Leg (a) composed: identical weights (imported from seeded reference
    torch modules) + identical pinned inputs, through the real model +
    fused-head pipeline on both sides; every deterministic term and the
    ex-contrastive total must match (train_arco_2d.py:310-428)."""

    @pytest.fixture(scope="class")
    def setup(self):
        m2 = rb.import_ref("model_2D")
        t2d = _t2d()
        import torch.nn as nn

        torch.manual_seed(11)
        model = m2.create_model(num_classes=K)
        model.eval()
        fe_q = m2.FeatureExtractor(fea_dim=[256, 128, 64, 32, 16],
                                   output_dim=496).eval()
        fe_k = m2.FeatureExtractor(fea_dim=[256, 128, 64, 32, 16],
                                   output_dim=496).eval()
        q_rep = nn.Sequential(
            nn.Conv2d(496, 496, kernel_size=1, bias=False),
            nn.Conv2d(496, 496, kernel_size=1, bias=False)).eval()

        r = np.random.RandomState(5)
        image_l = r.rand(B_L, 1, 32, 32).astype(np.float32)
        label_l = r.randint(0, K, size=(B_L, 32, 32)).astype(np.int64)
        u_aug = r.rand(B_U, 1, 32, 32).astype(np.float32)
        u_label = r.randint(-1, K, size=(B_U, 32, 32)).astype(np.int64)
        u_logits = r.rand(B_U, 32, 32).astype(np.float32)
        kp = 8
        pool = r.randn(kp, 496 * 32 * 32).astype(np.float32)
        pool = pool / np.linalg.norm(pool, axis=1, keepdims=True)
        return dict(m2=m2, t2d=t2d, model=model, fe_q=fe_q, fe_k=fe_k,
                    q_rep=q_rep, image_l=image_l, label_l=label_l,
                    u_aug=u_aug, u_label=u_label, u_logits=u_logits,
                    pool=pool, kp=kp)

    def _reference_terms(self, s):
        import torch.nn.functional as F
        from torch.nn.modules.loss import CrossEntropyLoss
        losses_mod = rb.import_ref("utils.losses")
        t2d = s["t2d"]

        with torch.no_grad():
            img_l = torch.tensor(s["image_l"])
            img_u = torch.tensor(s["u_aug"])
            lab_l = torch.tensor(s["label_l"])
            lab_u = torch.tensor(s["u_label"])
            log_u = torch.tensor(s["u_logits"])

            pred_l, _, l_fmap = s["model"](img_l)
            pred_u, _, u_fmap = s["model"](img_u)
            l_feat = s["fe_q"](l_fmap)
            u_feat = s["fe_q"](u_fmap)
            rep_l = s["q_rep"](l_feat)
            rep_u = s["q_rep"](u_feat)
            rep_l_t = s["fe_k"](l_fmap)
            rep_u_t = s["fe_k"](u_fmap)
            pred_all = torch.cat((pred_l, pred_u))

            loss_q = t2d.get_revisiting_loss(torch.tensor(s["pool"]),
                                             rep_u, rep_u_t, topk=5)
            loss_ce = CrossEntropyLoss()(pred_l, lab_l)
            loss_dice = losses_mod.DiceLoss(K)(
                torch.softmax(pred_l, dim=1), lab_l.unsqueeze(1))
            unsup = t2d.compute_unsupervised_loss(pred_u, lab_u, log_u, 0.97)

            prob_u = torch.softmax(pred_u, dim=1)
            entropy = -torch.sum(prob_u * torch.log(prob_u + 1e-10), dim=1)
            alpha_t = 20.0 * (1 - 100 / 1000)
            valid = lab_u >= 0
            low_thresh = np.percentile(
                entropy[valid].numpy().flatten(), alpha_t)
            high_thresh = np.percentile(
                entropy[valid].numpy().flatten(), 100 - alpha_t)
            low_entropy_mask = (entropy.le(low_thresh).float()
                                * valid.bool())
            high_entropy_mask = (entropy.ge(high_thresh).float()
                                 * valid.bool())

            # eqv leg with a pinned shared grid
            ref_tps_mod = rb.import_ref("tps.rand_tps")
            torch.manual_seed(21)
            import random as pyrandom
            pyrandom.seed(21)
            np.random.seed(21)
            tps = ref_tps_mod.RandTPS(32, 32, batch_size=B_L + B_U,
                                      sigma=0.01, random_mirror=True,
                                      random_scale=(0.8, 1.2), mode="affine")
            labels_cat = torch.cat((lab_l, lab_u), dim=0)
            logits_cat = torch.cat((torch.ones(lab_l.shape), log_u), dim=0)
            mask = torch.ones(labels_cat.shape)
            mask = torch.where(labels_cat == 0, torch.zeros_like(mask), mask)
            mask = torch.where(logits_cat < 0.7, torch.zeros_like(mask),
                               mask).unsqueeze(1)
            images_cj2 = torch.cat((img_l, img_u), dim=0)
            images_tps = tps(images_cj2)
            mask_tps = tps(mask.float(), padding_mode="zeros")
            pred_tps = s["model"](images_tps)[0]
            pred_tps_org = tps(pred_all, padding_mode="zeros")
            kl = torch.nn.KLDivLoss(reduction="none")
            loss_eqv = kl(F.log_softmax(pred_tps, dim=1),
                          F.softmax(pred_tps_org, dim=1))
            loss_eqv = (loss_eqv * mask_tps).flatten(1).sum(1) \
                / (mask_tps.flatten(1).sum(1) + 1e-7)
            loss_eqv = loss_eqv.mean()

        return {
            "loss_q": float(loss_q), "loss_ce": float(loss_ce),
            "loss_dice": float(loss_dice), "unsup": float(unsup),
            "loss_eqv": float(loss_eqv),
            "low_thresh": float(low_thresh), "high_thresh": float(high_thresh),
            "low_mask": low_entropy_mask.numpy(),
            "high_mask": high_entropy_mask.numpy(),
            "rep_all": torch.cat((rep_l, rep_u)).numpy(),
            "rep_t_all": torch.cat((rep_l_t, rep_u_t)).numpy(),
            "grid": tps.grid.detach().numpy(),
        }

    def _arco_terms(self, s, ref):
        from arco_tpu.augment.tps import RandTPS as MyTPS
        from arco_tpu.compat.torch_import import (
            convert_feature_extractor_state_dict,
            convert_q_representation_state_dict, convert_unet_state_dict)
        from arco_tpu.losses.supervised import cross_entropy, dice_loss
        from arco_tpu.models import net_factory
        from arco_tpu.models.heads import FeatureExtractor, QRepresentation

        model = net_factory("unet", in_chns=1, class_num=K)
        params, stats = convert_unet_state_dict(s["model"].state_dict())
        fe = FeatureExtractor(fea_dim=(256, 128, 64, 32, 16), output_dim=496)
        fe_q_p = convert_feature_extractor_state_dict(s["fe_q"].state_dict())
        fe_k_p = convert_feature_extractor_state_dict(s["fe_k"].state_dict())
        qr = QRepresentation(channels=496)
        qr_p = convert_q_representation_state_dict(s["q_rep"].state_dict())

        img_l = jnp.asarray(s["image_l"].transpose(0, 2, 3, 1))
        img_u = jnp.asarray(s["u_aug"].transpose(0, 2, 3, 1))
        lab_l = jnp.asarray(s["label_l"])
        lab_u = jnp.asarray(s["u_label"])
        log_u = jnp.asarray(s["u_logits"])

        apply = lambda x: model.apply(
            {"params": params, "batch_stats": stats}, x, train=False,
            rngs={"dropout": jax.random.PRNGKey(0)})
        pred_l, _, l_fmap = apply(img_l)
        pred_u, _, u_fmap = apply(img_u)
        feat_l = fe.apply({"params": fe_q_p}, l_fmap)
        feat_u = fe.apply({"params": fe_q_p}, u_fmap)
        rep_l = qr.apply({"params": qr_p}, feat_l)
        rep_u = qr.apply({"params": qr_p}, feat_u)
        rep_l_t = fe.apply({"params": fe_k_p}, l_fmap)
        rep_u_t = fe.apply({"params": fe_k_p}, u_fmap)
        pred_all = jnp.concatenate([pred_l, pred_u])

        kp = s["kp"]
        pool_native = jnp.asarray(
            s["pool"].reshape(kp, 496, 32, 32).transpose(0, 2, 3, 1))
        loss_q = consistency.revisiting_loss(pool_native, rep_u, rep_u_t,
                                             topk=5)
        probs_l = jax.nn.softmax(pred_l, axis=-1)
        loss_ce = cross_entropy(pred_l, lab_l)
        loss_dice = dice_loss(probs_l, lab_l, K)
        unsup = consistency.compute_unsupervised_loss(pred_u, lab_u, log_u,
                                                      0.97)

        prob_u = jax.nn.softmax(pred_u, axis=-1)
        entropy = -jnp.sum(prob_u * jnp.log(prob_u + 1e-10), axis=-1)
        alpha_t = 20.0 * (1 - 100 / 1000)
        valid = lab_u >= 0
        low_t, high_t = masked_percentiles(entropy, valid,
                                           [alpha_t, 100 - alpha_t])
        low_mask = (entropy <= low_t) & valid
        high_mask = (entropy >= high_t) & valid

        labels_cat = jnp.concatenate([lab_l, lab_u], axis=0)
        logits_cat = jnp.concatenate(
            [jnp.ones(lab_l.shape, jnp.float32), log_u], axis=0)
        mask = jnp.ones(labels_cat.shape, jnp.float32)
        mask = jnp.where(labels_cat == 0, 0.0, mask)
        mask = jnp.where(logits_cat < 0.7, 0.0, mask)[..., None]
        images_cj2 = jnp.concatenate([img_l, img_u], axis=0)
        my_tps = MyTPS(32, 32, batch_size=B_L + B_U)
        grid = jnp.asarray(ref["grid"])
        images_tps = my_tps.apply(images_cj2, grid, padding_mode="zeros")
        mask_tps = my_tps.apply(mask, grid, padding_mode="zeros")
        pred_tps, _, _ = apply(images_tps)
        pred_tps_org = my_tps.apply(pred_all, grid, padding_mode="zeros")
        loss_eqv = consistency.equivariance_loss(pred_tps, pred_tps_org,
                                                 mask_tps)

        return {
            "loss_q": float(loss_q), "loss_ce": float(loss_ce),
            "loss_dice": float(loss_dice), "unsup": float(unsup),
            "loss_eqv": float(loss_eqv),
            "low_thresh": float(low_t), "high_thresh": float(high_t),
            "low_mask": np.asarray(low_mask),
            "high_mask": np.asarray(high_mask),
            "rep_all": np.asarray(jnp.concatenate([rep_l, rep_u]))
            .transpose(0, 3, 1, 2),
            "rep_t_all": np.asarray(jnp.concatenate([rep_l_t, rep_u_t]))
            .transpose(0, 3, 1, 2),
        }

    def test_composed_terms(self, setup):
        ref = self._reference_terms(setup)
        mine = self._arco_terms(setup, ref)

        np.testing.assert_allclose(mine["rep_all"], ref["rep_all"],
                                   rtol=5e-3, atol=5e-4)
        np.testing.assert_allclose(mine["rep_t_all"], ref["rep_t_all"],
                                   rtol=5e-3, atol=5e-4)
        for term in ("loss_ce", "loss_dice", "unsup", "loss_q", "loss_eqv",
                     "low_thresh", "high_thresh"):
            np.testing.assert_allclose(
                mine[term], ref[term], rtol=2e-3, atol=2e-4,
                err_msg=f"term {term}")
        # entropy-split masks: identical membership up to threshold-boundary
        # pixels (float noise at the percentile cut)
        for m in ("low_mask", "high_mask"):
            diff = (mine[m] != (ref[m] > 0)).mean()
            assert diff < 0.01, f"{m} membership differs on {diff:.2%}"

        k1, k2, k3, k4 = 0.01, 1.0, 1.0, 1.0
        total_ref = (k3 * ref["unsup"] + ref["loss_ce"] + ref["loss_dice"]
                     + k2 * ref["loss_eqv"] + k4 * ref["loss_q"])
        total_mine = (k3 * mine["unsup"] + mine["loss_ce"]
                      + mine["loss_dice"] + k2 * mine["loss_eqv"]
                      + k4 * mine["loss_q"])
        np.testing.assert_allclose(total_mine, total_ref, rtol=2e-3)
