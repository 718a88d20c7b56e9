"""Pallas pool_similarities kernel parity (interpret mode on CPU) against
the XLA contraction that revisiting_loss uses in production."""

import jax.numpy as jnp
import numpy as np
import pytest

from arco_tpu.ops.pallas.pool_sims import pool_similarities


@pytest.mark.parametrize("b,k,f,chunk", [(3, 5, 1000, 256),
                                         (8, 36, 2048, 512)])
def test_matches_xla_einsum(rng, b, k, f, chunk):
    q = jnp.asarray(rng.randn(b, f).astype(np.float32))
    p = jnp.asarray(rng.randn(k, f).astype(np.float32))
    got = pool_similarities(q, p, chunk=chunk, interpret=True)
    want = np.asarray(q) @ np.asarray(p).T
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_pads_non_divisible_f(rng):
    q = jnp.asarray(rng.randn(2, 700).astype(np.float32))
    p = jnp.asarray(rng.randn(4, 700).astype(np.float32))
    got = pool_similarities(q, p, chunk=256, interpret=True)
    want = np.asarray(q) @ np.asarray(p).T
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
