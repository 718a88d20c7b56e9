"""COMPOSED-level parity for the 3D (volumetric) path — VERDICT r3 item 2.

The 2D path's composed parity lives in test_reference_parity.py; the 3D
trainer previously rested on self-consistency tests only. This file drives
the reference's OWN 5-D torch code (cuda-shimmed via refbridge) against
arco_tpu on identical weights and inputs:

 (a) loss_helper.compute_contra_memobank_loss (loss_helper.py:442-686 — the
     VOLUMETRIC file, see the SURVEY §0 naming trap) — pinned-exact + value
     at >= 3 classes so the contrastive term is provably nonzero (the LA
     2-class run has reco ≡ 0 by the rank-window quirk);
 (b) model_3D.ISD_3d (model_3D.py:219-451): full forward at a small volume,
     latent-logit legs exact; the patch-descriptor pipeline (the 700-patch
     triple loop -> pooled projection) against ops.patches.pooled_patch_grid
     + folded heads, exact per (batch, patch) BEFORE the reference's
     cat/reshape coordinate scramble (model_3D.py:381-397; the rebuild
     implements the stated intent with clean axes — train/pretrain.py:19-24);
 (c) train_arco_3d.py:249-401 composed deterministic terms (revisiting,
     CE+Dice, unsupervised, entropy split, shared-grid TPS equivariance)
     through the real V-Net + FeatureExtractor_3d + q_representation on
     imported weights.
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

B_L, B_U, H, W, D, K, C = 2, 2, 16, 16, 8, 4, 8


def _lh():
    return rb.import_ref("loss_helper")   # the 5-D file (SURVEY §0)


def _t3d():
    return rb.import_ref("train_arco_3d")


def _ncdhw_to_last(x):
    """torch [B, C, H, W, D] -> jax [B, H, W, D, C]."""
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 4, 1))


def _bn_dropout_eval(module):
    """train() for code paths, but BN on running stats and dropout off, so
    both sides are deterministic and stats don't mutate."""
    module.train()
    for m in module.modules():
        if isinstance(m, (torch.nn.modules.batchnorm._BatchNorm,
                          torch.nn.Dropout, torch.nn.Dropout2d,
                          torch.nn.Dropout3d)):
            m.eval()
    return module


def _pinned_contrastive_inputs_3d(cls=K):
    """5-D version of the pinned construction (test_reference_parity.py):
    per class, every anchor candidate is w_c, every negative v_c, prototype
    exactly u_c — the sampled indices cannot change the value, so the
    reference's grid sampler and our stratified sampler must agree to float
    tolerance: loss = log(exp(0.8/T) + N exp(0.96/T)) - 0.8/T per class."""
    b = B_L + B_U
    band = H // cls
    labels = np.zeros((b, H, W, D), np.int64)
    for c in range(cls):
        labels[:, c * band:(c + 1) * band] = c
    low_mask = np.zeros((b, H, W, D), np.float32)
    low_mask[:, :, : W // 2] = 1.0          # anchor/proto half
    high_mask = 1.0 - low_mask              # negative half

    u = np.eye(C, dtype=np.float32)[:cls]
    v = np.zeros((cls, C), np.float32)
    w = np.zeros((cls, C), np.float32)
    for c in range(cls):
        v[c, c], v[c, (c + 4) % C] = 0.6, 0.8
        w[c, c], w[c, (c + 4) % C] = 0.8, 0.6

    rep_teacher = np.zeros((b, H, W, D, C), np.float32)
    rep_student = np.zeros((b, H, W, D, C), np.float32)
    prob = np.zeros((b, H, W, D, cls), np.float32)
    other_low = [0.25, 0.2, 0.15]    # rank(c)=0 at anchor pixels
    other_high = [0.5, 0.25, 0.15]   # rank(c)=3 at negative pixels
    for c in range(cls):
        rows = slice(c * band, (c + 1) * band)
        rep_teacher[:, rows, : W // 2] = u[c] * 2.0
        rep_teacher[:, rows, W // 2:] = v[c] * 3.0
        rep_student[:, rows, :] = w[c] * 1.5
        others = [k for k in range(cls) if k != c]
        prob[:, rows, : W // 2, :, c] = 0.4
        prob[:, rows, W // 2:, :, c] = 0.1
        for o, p_lo, p_hi in zip(others, other_low, other_high):
            prob[:, rows, : W // 2, :, o] = p_lo
            prob[:, rows, W // 2:, :, o] = p_hi
    return labels, low_mask, high_mask, rep_student, rep_teacher, prob


class TestContrastive3DPinnedExact:
    """Leg (a): loss_helper.compute_contra_memobank_loss (5-D), reference vs
    arco_tpu, exact under the pinned construction."""

    NUM_Q, NUM_N, CAP = 16, 8, 64

    def _expected(self):
        temp = 0.5
        s_p, s_n = 0.8 / temp, 0.96 / temp
        return float(np.log(np.exp(s_p) + self.NUM_N * np.exp(s_n)) - s_p)

    def _ref_reco(self, labels, low, high, rep_s, rep_t, prob):
        lh = _lh()
        torch.manual_seed(0)
        import random as pyrandom
        pyrandom.seed(0)
        np.random.seed(0)

        onehot = np.eye(K, dtype=np.int64)[labels]          # [B,H,W,D,K]
        onehot = onehot.transpose(0, 4, 1, 2, 3)            # [B,K,H,W,D]
        prob_t = torch.tensor(prob.transpose(0, 4, 1, 2, 3))
        memobank = [[torch.zeros(1, C)] for _ in range(K)]
        ptrs = [torch.zeros(1, dtype=torch.long) for _ in range(K)]
        _, reco = lh.compute_contra_memobank_loss(
            torch.tensor(rep_s.transpose(0, 4, 1, 2, 3)),
            torch.tensor(onehot[:B_L]), torch.tensor(onehot[B_L:]),
            prob_t[:B_L], prob_t[B_L:],
            torch.tensor(low[:, None]), torch.tensor(high[:, None]),
            memobank, ptrs, [self.CAP] * K,
            torch.tensor(rep_t.transpose(0, 4, 1, 2, 3)),
            delta_n=1.0, func="smc",
            num_queries=self.NUM_Q, num_negatives=self.NUM_N, temp=0.5)
        return float(reco), memobank

    def test_reference_value(self):
        labels, low, high, rep_s, rep_t, prob = \
            _pinned_contrastive_inputs_3d()
        reco, memobank = self._ref_reco(labels, low, high, rep_s, rep_t,
                                        prob)
        np.testing.assert_allclose(reco, self._expected(), rtol=1e-5)
        for c in range(K):
            assert memobank[c][0].shape[0] == self.CAP

    def test_arco_matches_reference_exactly(self):
        labels, low, high, rep_s, rep_t, prob = \
            _pinned_contrastive_inputs_3d()
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

    def test_two_class_degenerate_reco_matches(self):
        """The LA quirk in the VOLUMETRIC helper, corrected from round 3:
        at 2 classes the rank window [low_rank=3, high_rank=20) is empty,
        NOTHING is ever enqueued — but the reference's reco is NOT zero.
        The `shape[0] > 0` guard (loss_helper.py:592-595) passes on the
        single randn init row (train_arco_3d.py:149), so the loss is the
        CE of the anchors against that row repeated as all negatives. With
        a pinned construction (identical anchors per class and a shared
        init row) both sides must agree to float tolerance."""
        lh = _lh()
        cls, num_q, num_n = 2, 8, 4
        labels, low, high, rep_s, rep_t, prob = \
            _pinned_contrastive_inputs_3d(cls=cls)
        r = np.random.RandomState(123)
        init_rows = r.randn(cls, C).astype(np.float32)
        init_rows /= np.linalg.norm(init_rows, axis=-1, keepdims=True)

        torch.manual_seed(0)
        import random as pyrandom
        pyrandom.seed(0)
        np.random.seed(0)
        onehot = np.eye(cls, dtype=np.int64)[labels] \
            .transpose(0, 4, 1, 2, 3)
        memobank = [[torch.tensor(init_rows[c:c + 1])] for c in range(cls)]
        ptrs = [torch.zeros(1, dtype=torch.long) for _ in range(cls)]
        prob_t = torch.tensor(prob.transpose(0, 4, 1, 2, 3))
        _, reco_ref = lh.compute_contra_memobank_loss(
            torch.tensor(rep_s.transpose(0, 4, 1, 2, 3)),
            torch.tensor(onehot[:B_L]), torch.tensor(onehot[B_L:]),
            prob_t[:B_L], prob_t[B_L:],
            torch.tensor(low[:, None]), torch.tensor(high[:, None]),
            memobank, ptrs, [64] * cls,
            torch.tensor(rep_t.transpose(0, 4, 1, 2, 3)),
            delta_n=1.0, func="smc", num_queries=num_q,
            num_negatives=num_n, temp=0.5)
        assert float(reco_ref) > 0.0
        for c in range(cls):
            assert memobank[c][0].shape[0] == 1   # nothing ever enqueued

        onehot_j = one_hot(jnp.asarray(labels), cls)
        prob_j = jnp.asarray(prob)
        bank = contrastive.create_memobank(cls, C, capacity=64,
                                           capacity_bg=64)
        bank = bank._replace(data=bank.data.at[:, 0].set(init_rows))
        new_bank, reco = contrastive.compute_contra_memobank_loss(
            jax.random.PRNGKey(1), jnp.asarray(rep_s), onehot_j, prob_j,
            contrastive.descending_rank(prob_j),
            jnp.array([True] * B_L + [False] * B_U),
            jnp.concatenate([onehot_j[:B_L],
                             jnp.zeros_like(onehot_j[B_L:])], 0),
            jnp.asarray(low), jnp.asarray(high), jnp.asarray(rep_t),
            bank, delta_n=1.0, func="smc", num_queries=num_q,
            num_negatives=num_n, temp=0.5, enqueue_per_class=16)
        np.testing.assert_allclose(float(reco), float(reco_ref), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(new_bank.count), 1)


def _random_contrastive_case_3d(seed):
    r = np.random.RandomState(seed)
    b = B_L + B_U
    labels = r.randint(0, K, size=(b, H, W, D)).astype(np.int64)
    rep_s = r.randn(b, H, W, D, C).astype(np.float32)
    rep_t = r.randn(b, H, W, D, C).astype(np.float32)
    logits = r.randn(b, H, W, D, K).astype(np.float32)
    prob = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    low = (r.rand(b, H, W, D) > 0.4).astype(np.float32)
    high = (r.rand(b, H, W, D) > 0.4).astype(np.float32)
    return labels, low, high, rep_s, rep_t, prob


class TestContrastive3DStatistical:
    """Leg (a) statistical: sampled 5-D loss over many draws on IDENTICAL
    pre-filled banks (delta_n=0 disables enqueue on both sides)."""

    M = 16
    NUM_Q, NUM_N = 32, 16

    def test_sampled_loss_means_agree(self):
        lh = _lh()
        labels, low, high, rep_s, rep_t, prob = \
            _random_contrastive_case_3d(0)
        r = np.random.RandomState(1000)
        rows = r.randn(K, 48, C).astype(np.float32)
        rows = rows / np.linalg.norm(rows, axis=-1, keepdims=True)
        onehot = np.eye(K, dtype=np.int64)[labels].transpose(0, 4, 1, 2, 3)
        prob_t = torch.tensor(prob.transpose(0, 4, 1, 2, 3))

        import random as pyrandom
        ref = []
        for m in range(self.M):
            torch.manual_seed(m)
            pyrandom.seed(m)
            np.random.seed(m)
            memobank = [[torch.tensor(rows[c])] for c in range(K)]
            ptrs = [torch.zeros(1, dtype=torch.long) for _ in range(K)]
            _, reco = lh.compute_contra_memobank_loss(
                torch.tensor(rep_s.transpose(0, 4, 1, 2, 3)),
                torch.tensor(onehot[:B_L]), torch.tensor(onehot[B_L:]),
                prob_t[:B_L], prob_t[B_L:],
                torch.tensor(low[:, None]), torch.tensor(high[:, None]),
                memobank, ptrs, [48] * K,
                torch.tensor(rep_t.transpose(0, 4, 1, 2, 3)),
                delta_n=0.0, func="smc",
                num_queries=self.NUM_Q, num_negatives=self.NUM_N, temp=0.5)
            ref.append(float(reco))
        ref = np.asarray(ref)

        onehot_all = one_hot(jnp.asarray(labels), K)
        prob_all = jnp.asarray(prob)
        rank_all = contrastive.descending_rank(prob_all)
        bank = contrastive.create_memobank(K, C, capacity=48, capacity_bg=48)
        bank = bank._replace(data=jnp.asarray(rows),
                             count=jnp.full((K,), 48, jnp.int32))
        fn = jax.jit(lambda key: contrastive.compute_contra_memobank_loss(
            key, jnp.asarray(rep_s), onehot_all, prob_all, rank_all,
            jnp.array([True] * B_L + [False] * B_U),
            jnp.concatenate([onehot_all[:B_L],
                             jnp.zeros_like(onehot_all[B_L:])], 0),
            jnp.asarray(low), jnp.asarray(high), jnp.asarray(rep_t), bank,
            delta_n=0.0, func="smc", num_queries=self.NUM_Q,
            num_negatives=self.NUM_N, temp=0.5, enqueue_per_class=16)[1])
        mine = np.asarray([float(fn(jax.random.PRNGKey(m)))
                           for m in range(self.M)])

        se = np.sqrt(ref.var() / self.M + mine.var() / self.M)
        assert abs(ref.mean() - mine.mean()) < max(4 * se, 0.02), \
            f"ref {ref.mean():.4f}±{ref.std():.4f} vs " \
            f"arco {mine.mean():.4f}±{mine.std():.4f}"


class TestISD3dParity:
    """Leg (b): model_3D.ISD_3d driven end-to-end at a small volume.

    Exact legs: model outputs, latent-queue logits (student + teacher),
    the queue enqueue, and the per-(batch, patch) pooled descriptors before
    the reference's coordinate scramble. The scrambled output-logit matmul
    (model_3D.py:381-397 raw-memory reshape) is intentionally NOT
    replicated (train/pretrain.py:19-24 documents the substitution)."""

    VOL = (48, 48, 32)          # 3x3x2 = 18 patches of 20^3, step 10
    NC = 4
    KQ = 8

    @pytest.fixture(scope="class")
    def setup(self):
        m3 = rb.import_ref("model_3D")
        torch.manual_seed(17)
        isd = m3.ISD_3d(K=self.KQ, m=0.99, Ts=0.1, Tt=0.01,
                        num_classes=self.NC, latent_pooling_size=1,
                        latent_feature_size=32, output_pooling_size=4,
                        patch_size=20)
        # the queue_mask buffer hardcodes the 700-patch [112,112,80] grid
        # (model_3D.py:262); resize it for the small test volume
        n_patches = 18
        torch.manual_seed(18)
        qm = torch.nn.functional.normalize(
            torch.randn(self.KQ, n_patches, self.NC * 4 ** 3), dim=-1)
        isd.queue_mask = qm.clone()
        _bn_dropout_eval(isd)

        r = np.random.RandomState(7)
        im_q = r.rand(B_L + B_U, 1, *self.VOL).astype(np.float32)
        im_k = r.rand(B_L + B_U, 1, *self.VOL).astype(np.float32)
        return dict(m3=m3, isd=isd, im_q=im_q, im_k=im_k,
                    n_patches=n_patches)

    def _reference_forward(self, s):
        isd = s["isd"]
        torch.manual_seed(0)   # get_shuffle_ids randperm
        q0 = isd.queue.clone()
        qm0 = isd.queue_mask.clone()
        with torch.no_grad():
            tq = torch.tensor(s["im_q"])
            tk = torch.tensor(s["im_k"])
            outs = isd(tq, tk)
            (outputs, ema_output_tmp, ema_latent_logits, latent_logits,
             ema_output_logits, output_logits) = outs
            # the pre-scramble patch descriptors, replayed through ISD_3d's
            # own modules with the same loop bounds (model_3D.py:355-359)
            out_q, _, _ = isd.model(tq)
            ema_out, _, _ = isd.ema_model(tk)
            p = isd.patch_size
            st = p // 2
            stu_list, tea_list = [], []
            for i in range(0, out_q.shape[2] - p + 1, st):
                for j in range(0, out_q.shape[3] - p + 1, st):
                    for k in range(0, out_q.shape[4] - p + 1, st):
                        sl = (slice(None), slice(None), slice(i, i + p),
                              slice(j, j + p), slice(k, k + p))
                        stu_list.append(isd.outputs_predictor(
                            isd.q_outputs_head(out_q[sl])))
                        tea_list.append(isd.k_outputs_head(ema_out[sl]))
            # [P][B, C, s, s, s] -> [B, P, C*s^3] (patch-major grid order)
            stu_desc = torch.stack(stu_list, dim=1).flatten(2)
            tea_desc = torch.stack(tea_list, dim=1).flatten(2)
        return dict(outputs=outputs, ema_output_tmp=ema_output_tmp,
                    ema_latent_logits=ema_latent_logits,
                    latent_logits=latent_logits, queue0=q0, qmask0=qm0,
                    stu_desc=stu_desc.numpy(), tea_desc=tea_desc.numpy(),
                    queue_after=isd.queue.clone().numpy())

    def test_isd3d_exact_legs(self, setup):
        from arco_tpu.compat.torch_import import (
            convert_latent_mlp_state_dict,
            convert_latent_predictor_state_dict,
            convert_outputs_predictor_state_dict,
            convert_projection_head_state_dict, convert_vnet_state_dict)
        from arco_tpu.models import net_factory_3d
        from arco_tpu.models.heads import (LatentMLP, LatentPredictor,
                                           OutputsPredictor, ProjectionHead)
        from arco_tpu.ops.ring_buffer import enqueue_fixed
        from arco_tpu.train.pretrain import (_normalized_logits,
                                             _patch_descriptors,
                                             make_isd_modules)

        s = setup
        ref = self._reference_forward(s)
        isd = s["isd"]

        model = net_factory_3d("vnet", in_chns=1, class_num=self.NC)
        params, stats = convert_vnet_state_dict(isd.model.state_dict())
        apply = lambda x: model.apply(
            {"params": params, "batch_stats": stats}, x, train=False,
            rngs={"dropout": jax.random.PRNGKey(0)})

        xq = jnp.asarray(s["im_q"].transpose(0, 2, 3, 4, 1))
        xk = jnp.asarray(s["im_k"].transpose(0, 2, 3, 4, 1))
        logits_q, latent_q, _ = apply(xq)
        logits_k, latent_k, _ = apply(xk)   # student == teacher at init

        np.testing.assert_allclose(
            np.asarray(logits_q),
            ref["outputs"].numpy().transpose(0, 2, 3, 4, 1),
            rtol=5e-3, atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(logits_k),
            ref["ema_output_tmp"].numpy().transpose(0, 2, 3, 4, 1),
            rtol=5e-3, atol=5e-4)

        # ---- latent logits (exact contract, no scramble) ----------------
        lmlp = LatentMLP(input_channels=128, num_class=32, pooling_size=1)
        lp = LatentPredictor(feature_size=32)
        k_lat = lmlp.apply(
            {"params": convert_latent_mlp_state_dict(
                isd.k_latent_head.state_dict())}, latent_k)
        q_lat = lp.apply(
            {"params": convert_latent_predictor_state_dict(
                isd.latent_predictor.state_dict())},
            lmlp.apply({"params": convert_latent_mlp_state_dict(
                isd.q_latent_head.state_dict())}, latent_q))
        queue0 = jnp.asarray(ref["queue0"].numpy())
        np.testing.assert_allclose(
            np.asarray(_normalized_logits(k_lat, queue0, 0.01)),
            ref["ema_latent_logits"].numpy(), rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(_normalized_logits(q_lat, queue0, 0.1)),
            ref["latent_logits"].numpy(), rtol=2e-3, atol=2e-4)

        # ---- queue enqueue: keys are the teacher latents ----------------
        new_q, _ = enqueue_fixed(queue0, jnp.array(0, jnp.int32), k_lat)
        np.testing.assert_allclose(np.asarray(new_q), ref["queue_after"],
                                   rtol=2e-3, atol=2e-4)

        # ---- patch descriptors: reference triple loop vs folded grid ----
        modules = make_isd_modules(
            model, num_classes=self.NC, latent_feature_size=32,
            output_pooling_size=4, latent_channels=128)
        assert modules.outputs_head.output_pooling_size == 4
        oh_p = convert_projection_head_state_dict(
            isd.q_outputs_head.state_dict())
        op_p = convert_outputs_predictor_state_dict(
            isd.outputs_predictor.state_dict())
        kh_p = convert_projection_head_state_dict(
            isd.k_outputs_head.state_dict())
        stu_desc = _patch_descriptors(modules, oh_p, logits_q, 20, 10,
                                      predictor_params=op_p)
        tea_desc = _patch_descriptors(modules, kh_p, logits_k, 20, 10)
        assert stu_desc.shape[1] == s["n_patches"]
        # torch flattens [C, s, s, s] channel-major; ours is channels-last —
        # compare in the torch layout
        def to_torch_layout(d):
            b, p = d.shape[:2]
            d = d.reshape(b, p, 4, 4, 4, self.NC)
            return np.asarray(d).transpose(0, 1, 5, 2, 3, 4).reshape(b, p, -1)
        np.testing.assert_allclose(to_torch_layout(stu_desc),
                                   ref["stu_desc"], rtol=5e-3, atol=5e-4)
        np.testing.assert_allclose(to_torch_layout(tea_desc),
                                   ref["tea_desc"], rtol=5e-3, atol=5e-4)


class TestComposedStep3DParity:
    """Leg (c): train_arco_3d.py:249-401 deterministic terms through the
    real V-Net + FeatureExtractor_3d + q_representation on imported weights
    at a 48x48x32 volume with 4 classes."""

    VOL = (48, 48, 32)
    NC = 4

    @pytest.fixture(scope="class")
    def setup(self):
        m3 = rb.import_ref("model_3D")
        t3d = _t3d()
        import torch.nn as nn

        torch.manual_seed(11)
        model = _bn_dropout_eval(m3.create_model_3d(num_classes=self.NC))
        fe_q = _bn_dropout_eval(m3.FeatureExtractor_3d(
            fea_dim=[128, 64, 32, 16, 16], output_dim=16))
        fe_k = _bn_dropout_eval(m3.FeatureExtractor_3d(
            fea_dim=[128, 64, 32, 16, 16], output_dim=16))
        q_rep = nn.Sequential(
            nn.Conv3d(16, 16, kernel_size=1, bias=False),
            nn.Conv3d(16, 16, kernel_size=1, bias=False)).eval()

        r = np.random.RandomState(5)
        image_l = r.rand(B_L, 1, *self.VOL).astype(np.float32)
        label_l = r.randint(0, self.NC, size=(B_L,) + self.VOL) \
            .astype(np.int64)
        u_aug = r.rand(B_U, 1, *self.VOL).astype(np.float32)
        u_label = r.randint(-1, self.NC, size=(B_U,) + self.VOL) \
            .astype(np.int64)
        u_logits = r.rand(B_U, *self.VOL).astype(np.float32)
        kp = 6
        pool = r.randn(kp, 16 * int(np.prod(self.VOL))).astype(np.float32)
        pool = pool / np.linalg.norm(pool, axis=1, keepdims=True)
        return dict(m3=m3, t3d=t3d, model=model, fe_q=fe_q, fe_k=fe_k,
                    q_rep=q_rep, image_l=image_l, label_l=label_l,
                    u_aug=u_aug, u_label=u_label, u_logits=u_logits,
                    pool=pool, kp=kp)

    def _reference_terms(self, s):
        import torch.nn.functional as F
        from torch.nn.modules.loss import CrossEntropyLoss
        losses_mod = rb.import_ref("utils.losses")
        t3d = s["t3d"]

        with torch.no_grad():
            img_l = torch.tensor(s["image_l"])
            img_u = torch.tensor(s["u_aug"])
            lab_l = torch.tensor(s["label_l"])
            lab_u = torch.tensor(s["u_label"])
            log_u = torch.tensor(s["u_logits"])

            pred_l, _, l_fmap = s["model"](img_l)
            pred_u, _, u_fmap = s["model"](img_u)
            rep_l = s["q_rep"](s["fe_q"](l_fmap))
            rep_u = s["q_rep"](s["fe_q"](u_fmap))
            rep_l_t = s["fe_k"](l_fmap)
            rep_u_t = s["fe_k"](u_fmap)
            pred_all = torch.cat((pred_l, pred_u))

            loss_q = t3d.get_revisiting_loss(torch.tensor(s["pool"]),
                                             rep_u, rep_u_t, topk=3)
            loss_ce = CrossEntropyLoss()(pred_l, lab_l)
            loss_dice = losses_mod.DiceLoss(self.NC)(
                torch.softmax(pred_l, dim=1), lab_l.unsqueeze(1))
            unsup = t3d.compute_unsupervised_loss(pred_u, lab_u, log_u, 0.97)

            prob_u = torch.softmax(pred_u, dim=1)
            entropy = -torch.sum(prob_u * torch.log(prob_u + 1e-10), dim=1)
            alpha_t = 20.0 * (1 - 100 / 1000)
            valid = lab_u >= 0
            low_thresh = np.percentile(
                entropy[valid].numpy().flatten(), alpha_t)
            high_thresh = np.percentile(
                entropy[valid].numpy().flatten(), 100 - alpha_t)

            # eqv leg with a pinned shared grid (train_arco_3d.py:369-389)
            ref_tps_mod = rb.import_ref("tps.rand_tps_3d")
            torch.manual_seed(21)
            import random as pyrandom
            pyrandom.seed(21)
            np.random.seed(21)
            tps = ref_tps_mod.RandTPS(*self.VOL, batch_size=B_L + B_U,
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
            "low_thresh": float(low_thresh),
            "high_thresh": float(high_thresh),
            "rep_all": torch.cat((rep_l, rep_u)).numpy(),
            "rep_t_all": torch.cat((rep_l_t, rep_u_t)).numpy(),
            "grid": tps.grid.detach().numpy(),
        }

    def _arco_terms(self, s, ref):
        from arco_tpu.augment.tps import RandTPS as MyTPS
        from arco_tpu.compat.torch_import import (
            convert_feature_extractor_state_dict,
            convert_q_representation_state_dict, convert_vnet_state_dict)
        from arco_tpu.losses.supervised import cross_entropy, dice_loss
        from arco_tpu.models import net_factory_3d
        from arco_tpu.models.heads import FeatureExtractor, QRepresentation

        model = net_factory_3d("vnet", in_chns=1, class_num=self.NC)
        params, stats = convert_vnet_state_dict(s["model"].state_dict())
        fe = FeatureExtractor(fea_dim=(128, 64, 32, 16, 16), output_dim=16)
        fe_q_p = convert_feature_extractor_state_dict(s["fe_q"].state_dict())
        fe_k_p = convert_feature_extractor_state_dict(s["fe_k"].state_dict())
        qr = QRepresentation(channels=16)
        qr_p = convert_q_representation_state_dict(s["q_rep"].state_dict())

        img_l = jnp.asarray(s["image_l"].transpose(0, 2, 3, 4, 1))
        img_u = jnp.asarray(s["u_aug"].transpose(0, 2, 3, 4, 1))
        lab_l = jnp.asarray(s["label_l"])
        lab_u = jnp.asarray(s["u_label"])
        log_u = jnp.asarray(s["u_logits"])

        apply = lambda x: model.apply(
            {"params": params, "batch_stats": stats}, x, train=False,
            rngs={"dropout": jax.random.PRNGKey(0)})
        pred_l, _, l_fmap = apply(img_l)
        pred_u, _, u_fmap = apply(img_u)
        rep_l = qr.apply({"params": qr_p},
                         fe.apply({"params": fe_q_p}, l_fmap))
        rep_u = qr.apply({"params": qr_p},
                         fe.apply({"params": fe_q_p}, u_fmap))
        rep_l_t = fe.apply({"params": fe_k_p}, l_fmap)
        rep_u_t = fe.apply({"params": fe_k_p}, u_fmap)
        pred_all = jnp.concatenate([pred_l, pred_u])

        kp = s["kp"]
        pool_native = jnp.asarray(
            s["pool"].reshape((kp, 16) + self.VOL)
            .transpose(0, 2, 3, 4, 1))
        loss_q = consistency.revisiting_loss(pool_native, rep_u, rep_u_t,
                                             topk=3)
        probs_l = jax.nn.softmax(pred_l, axis=-1)
        loss_ce = cross_entropy(pred_l, lab_l)
        loss_dice = dice_loss(probs_l, lab_l, self.NC)
        unsup = consistency.compute_unsupervised_loss(pred_u, lab_u, log_u,
                                                      0.97)

        prob_u = jax.nn.softmax(pred_u, axis=-1)
        entropy = -jnp.sum(prob_u * jnp.log(prob_u + 1e-10), axis=-1)
        alpha_t = 20.0 * (1 - 100 / 1000)
        valid = lab_u >= 0
        low_t, high_t = masked_percentiles(entropy, valid,
                                           [alpha_t, 100 - alpha_t])

        labels_cat = jnp.concatenate([lab_l, lab_u], axis=0)
        logits_cat = jnp.concatenate(
            [jnp.ones(lab_l.shape, jnp.float32), log_u], axis=0)
        mask = jnp.ones(labels_cat.shape, jnp.float32)
        mask = jnp.where(labels_cat == 0, 0.0, mask)
        mask = jnp.where(logits_cat < 0.7, 0.0, mask)[..., None]
        images_cj2 = jnp.concatenate([img_l, img_u], axis=0)
        my_tps = MyTPS(self.VOL[1], self.VOL[0], batch_size=B_L + B_U)
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
            "rep_all": np.asarray(jnp.concatenate([rep_l, rep_u]))
            .transpose(0, 4, 1, 2, 3),
            "rep_t_all": np.asarray(jnp.concatenate([rep_l_t, rep_u_t]))
            .transpose(0, 4, 1, 2, 3),
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

        # the 3D total EXCLUDES eqv (train_arco_3d.py:390-391)
        k1, k3, k4 = 0.01, 1.0, 1.0
        total_ref = (k3 * ref["unsup"] + ref["loss_ce"] + ref["loss_dice"]
                     + k4 * ref["loss_q"])
        total_mine = (k3 * mine["unsup"] + mine["loss_ce"]
                      + mine["loss_dice"] + k4 * mine["loss_q"])
        np.testing.assert_allclose(total_mine, total_ref, rtol=2e-3)
