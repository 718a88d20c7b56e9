"""Histogram percentile must approximate the exact masked percentile."""

import jax.numpy as jnp
import numpy as np

from arco_tpu.train.arco2d import (masked_percentiles,
                                   masked_percentiles_histogram)


class TestHistogramPercentile:
    def test_close_to_exact(self, rng):
        vals = rng.rand(50000).astype(np.float32) * 1.386  # entropy-like
        mask = rng.rand(50000) > 0.3
        for pcts in ([5.0, 95.0], [20.0, 80.0]):
            exact = masked_percentiles(jnp.array(vals), jnp.array(mask),
                                       pcts)
            approx = masked_percentiles_histogram(
                jnp.array(vals), jnp.array(mask), pcts, lo=0.0, hi=1.386)
            for e, a in zip(exact, approx):
                assert abs(float(e) - float(a)) < 0.005

    def test_membership_agreement(self, rng):
        """The masks induced by both thresholds agree on ~all pixels."""
        vals = rng.rand(20000).astype(np.float32)
        mask = np.ones(20000, bool)
        (e_lo,) = masked_percentiles(jnp.array(vals), jnp.array(mask),
                                     [20.0])
        (a_lo,) = masked_percentiles_histogram(
            jnp.array(vals), jnp.array(mask), [20.0], lo=0.0, hi=1.0)
        m_e = vals <= float(e_lo)
        m_a = vals <= float(a_lo)
        assert (m_e == m_a).mean() > 0.995

    def test_empty_mask_no_nan(self, rng):
        """All-false mask (no valid unlabeled pixels) must not produce NaN
        (VERDICT r1 weak #5: hi == lo == 0 gave 0/0 in the auto-range)."""
        vals = rng.rand(1024).astype(np.float32)
        mask = np.zeros(1024, bool)
        for fn in (masked_percentiles,
                   lambda v, m, p: masked_percentiles_histogram(v, m, p)):
            outs = fn(jnp.array(vals), jnp.array(mask), [20.0, 80.0])
            for o in outs:
                assert np.isfinite(float(o))
                assert float(o) == 0.0
