"""Device sliding-window evaluator must match the host-accumulated one."""

import jax.numpy as jnp
import numpy as np

from arco_tpu.eval.sliding_window import test_single_case_3d as host_case
from arco_tpu.eval.sliding_window_device import \
    test_single_case_3d_device as dev_case


def oracle(x):
    fg = (x[..., 0] > 0.5).astype(jnp.float32)
    return jnp.stack([1 - fg, fg], axis=-1)


class TestDeviceSlidingWindow:
    def test_matches_host_version(self, rng):
        image = rng.rand(24, 20, 18).astype(np.float32)
        kwargs = dict(stride_xy=6, stride_z=5, patch_size=(12, 12, 10),
                      num_classes=2)
        pred_h, score_h = host_case(oracle, image, **kwargs)
        pred_d, score_d = dev_case(oracle, image, **kwargs)
        np.testing.assert_array_equal(pred_d, pred_h)
        np.testing.assert_allclose(score_d, score_h, atol=1e-5)

    def test_padding_path(self, rng):
        image = rng.rand(8, 8, 6).astype(np.float32)  # smaller than patch
        kwargs = dict(stride_xy=6, stride_z=5, patch_size=(12, 12, 10),
                      num_classes=2)
        pred_h, _ = host_case(oracle, image, **kwargs)
        pred_d, _ = dev_case(oracle, image, **kwargs)
        np.testing.assert_array_equal(pred_d, pred_h)
