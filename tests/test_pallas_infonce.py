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
        idx = jnp.array([[0, 0, 2], [1, 3, 3]], jnp.int32)
        c = np.asarray(_counts_matrix(idx, 4))
        np.testing.assert_array_equal(c, [[2, 0, 1, 0], [0, 1, 0, 2]])


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
