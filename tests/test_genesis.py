"""Tests for ModelsGenesis-style intensity augmentations."""

import jax
import jax.numpy as jnp
import numpy as np

from arco_tpu.augment import genesis


class TestBezier:
    def test_endpoints(self):
        xs, ys = genesis.bezier_curve([[0, 0], [0.3, 0.7], [0.6, 0.2],
                                       [1, 1]], n_times=100)
        np.testing.assert_allclose(float(xs[0]), 0.0, atol=1e-6)
        np.testing.assert_allclose(float(xs[-1]), 1.0, atol=1e-6)
        np.testing.assert_allclose(float(ys[-1]), 1.0, atol=1e-6)


class TestNonlinear:
    def test_preserves_range_and_shape(self, rng):
        x = jnp.array(rng.rand(16, 16, 1).astype(np.float32))
        out = genesis.nonlinear_transformation(jax.random.PRNGKey(0), x,
                                               prob=1.0)
        assert out.shape == x.shape
        assert float(out.min()) >= -0.01 and float(out.max()) <= 1.01


class TestLocalShuffle:
    def test_multiset_preserved_locally(self, rng):
        x = jnp.array(rng.rand(32, 32, 1).astype(np.float32))
        out = genesis.local_pixel_shuffling(jax.random.PRNGKey(1), x,
                                            prob=1.0, num_block=10)
        assert out.shape == x.shape
        assert not np.allclose(np.asarray(out), np.asarray(x))


class TestPainting:
    def test_in_painting_changes_blocks(self, rng):
        x = jnp.zeros((32, 32, 1))
        out = genesis.image_in_painting(jax.random.PRNGKey(2), x)
        changed = (np.asarray(out) != 0).mean()
        assert 0.0 < changed < 0.9

    def test_out_painting_keeps_window(self, rng):
        x = jnp.zeros((32, 32, 1))
        out = genesis.image_out_painting(jax.random.PRNGKey(3), x)
        kept = (np.asarray(out) == 0).mean()
        assert 0.2 < kept < 1.0
