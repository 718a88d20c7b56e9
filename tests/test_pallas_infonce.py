"""The streaming Pallas InfoNCE kernel must agree with the direct sampled
CE (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from arco_tpu.losses.contrastive import sampled_infonce
from arco_tpu.ops.pallas.infonce import (_counts_matrix,
                                         pallas_sampled_infonce)


class TestCounts:
    def test_counts_matrix(self):
        # stored TRANSPOSED [capacity, Q] so the Pallas blocks keep Q on the
        # last axis (Mosaic lane-dim rule — see ops/pallas/infonce.py)
        idx = jnp.array([[0, 0, 2], [1, 3, 3]], jnp.int32)
        c = np.asarray(_counts_matrix(idx, 4))
        np.testing.assert_array_equal(
            c, np.asarray([[2, 0, 1, 0], [0, 1, 0, 2]]).T)

    def test_valid_tile(self):
        from arco_tpu.ops.pallas.infonce import valid_tile
        assert valid_tile(50000, 2000) == 2000
        assert valid_tile(50000, 2500) == 2000   # 2500 % 8 != 0 -> round
        assert valid_tile(30000, 2000) == 2000
        assert valid_tile(128, 2000) == 128      # cap <= request: one tile
        for cap, req in [(50000, 2500), (30000, 1024), (30000, 999)]:
            t = valid_tile(cap, req)
            assert cap % t == 0 and (t % 8 == 0 or t == cap), (cap, req, t)


class TestKernel:
    def test_matches_reference_formulation(self, rng):
        q, n, c, cap = 8, 16, 32, 128
        anchor = jnp.array(rng.randn(q, c).astype(np.float32))
        proto = jnp.array(rng.randn(c).astype(np.float32))
        bank = jnp.array(rng.randn(cap, c).astype(np.float32))
        idx = jnp.array(rng.randint(0, cap, size=(q, n)).astype(np.int32))

        direct = float(sampled_infonce(anchor, proto, bank, idx, temp=0.5))
        kernel = float(pallas_sampled_infonce(anchor, proto, bank, idx,
                                              temp=0.5, tile=64,
                                              interpret=True))
        np.testing.assert_allclose(kernel, direct, rtol=1e-4)

    def test_single_tile(self, rng):
        q, n, c, cap = 4, 8, 16, 32
        anchor = jnp.array(rng.randn(q, c).astype(np.float32))
        proto = jnp.array(rng.randn(c).astype(np.float32))
        bank = jnp.array(rng.randn(cap, c).astype(np.float32))
        idx = jnp.array(rng.randint(0, cap, size=(q, n)).astype(np.int32))
        direct = float(sampled_infonce(anchor, proto, bank, idx, temp=0.5))
        kernel = float(pallas_sampled_infonce(anchor, proto, bank, idx,
                                              temp=0.5, tile=32,
                                              interpret=True))
        np.testing.assert_allclose(kernel, direct, rtol=1e-4)


class TestGradients:
    """The custom VJP (a second streaming pass over the bank) must agree
    with autodiff through the XLA formulation for anchor AND proto; the
    bank receives zero gradient by contract (detached teacher keys)."""

    def test_anchor_and_proto_grads(self, rng):
        q, n, c, cap = 8, 16, 32, 128
        anchor = jnp.array(rng.randn(q, c).astype(np.float32))
        proto = jnp.array(rng.randn(c).astype(np.float32))
        bank = jnp.array(rng.randn(cap, c).astype(np.float32))
        idx = jnp.array(rng.randint(0, cap, size=(q, n)).astype(np.int32))

        ref_ga, ref_gp = jax.grad(
            lambda a, p: sampled_infonce(a, p, bank, idx, temp=0.5),
            argnums=(0, 1))(anchor, proto)
        ga, gp = jax.grad(
            lambda a, p: pallas_sampled_infonce(a, p, bank, idx, temp=0.5,
                                                tile=64, interpret=True),
            argnums=(0, 1))(anchor, proto)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(ref_ga),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(ref_gp),
                                   rtol=1e-4, atol=1e-6)

    def test_bank_grad_is_zero(self, rng):
        q, n, c, cap = 4, 8, 16, 32
        anchor = jnp.array(rng.randn(q, c).astype(np.float32))
        proto = jnp.array(rng.randn(c).astype(np.float32))
        bank = jnp.array(rng.randn(cap, c).astype(np.float32))
        idx = jnp.array(rng.randint(0, cap, size=(q, n)).astype(np.int32))
        gb = jax.grad(
            lambda b: pallas_sampled_infonce(anchor, proto, b, idx,
                                             temp=0.5, tile=32,
                                             interpret=True))(bank)
        # the normalization chain outside the custom op contributes zero
        # because the core returns a zero bank cotangent
        np.testing.assert_array_equal(np.asarray(gb), 0.0)


class TestMemobankLossWithPallas:
    """compute_contra_memobank_loss(infonce_fn=pallas) value parity with
    the default XLA path — same RNG key, same sampled indices, so the loss
    must match to float tolerance."""

    def test_full_loss_parity(self, rng):
        from arco_tpu.losses import contrastive
        from arco_tpu.losses.supervised import one_hot
        from arco_tpu.ops.pallas.infonce import make_infonce_fn

        b, h, w, k, c = 4, 12, 12, 4, 16
        labels = rng.randint(0, k, size=(b, h, w)).astype(np.int64)
        rep_s = rng.randn(b, h, w, c).astype(np.float32)
        rep_t = rng.randn(b, h, w, c).astype(np.float32)
        logits = rng.randn(b, h, w, k).astype(np.float32)
        prob = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        low = (rng.rand(b, h, w) > 0.4).astype(np.float32)
        high = (rng.rand(b, h, w) > 0.4).astype(np.float32)

        onehot = one_hot(jnp.asarray(labels), k)
        prob_j = jnp.asarray(prob)
        args = (jnp.asarray(rep_s), onehot, prob_j,
                contrastive.descending_rank(prob_j),
                jnp.array([True, True, False, False]),
                jnp.concatenate([onehot[:2], jnp.zeros_like(onehot[2:])], 0),
                jnp.asarray(low), jnp.asarray(high), jnp.asarray(rep_t))
        kwargs = dict(delta_n=1.0, func="smc", num_queries=16,
                      num_negatives=8, temp=0.5, enqueue_per_class=32)
        bank0 = contrastive.create_memobank(k, c, capacity=64,
                                            capacity_bg=64)
        key = jax.random.PRNGKey(3)
        _, reco_xla = contrastive.compute_contra_memobank_loss(
            key, *args, memobank=bank0, **kwargs)
        _, reco_pl = contrastive.compute_contra_memobank_loss(
            key, *args, memobank=bank0,
            infonce_fn=make_infonce_fn(use_pallas=True, tile=64,
                                       interpret=True), **kwargs)
        np.testing.assert_allclose(float(reco_pl), float(reco_xla),
                                   rtol=1e-4)
        # the trainer's configuration: banks hold keys L2-normalized at
        # enqueue time, so the kernel may stream them as stored (no per-step
        # renormalize pass) — must be numerically identical
        _, reco_pln = contrastive.compute_contra_memobank_loss(
            key, *args, memobank=bank0,
            infonce_fn=make_infonce_fn(use_pallas=True, tile=64,
                                       interpret=True, bank_normalized=True),
            **kwargs)
        np.testing.assert_allclose(float(reco_pln), float(reco_xla),
                                   rtol=1e-4)
