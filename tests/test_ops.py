"""Unit tests for core ops: interpolation, grid_sample parity vs torch,
samplers, ring buffers, patches, gaussian blur."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arco_tpu.ops import interpolate, sampling, ring_buffer, patches, gaussian

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


class TestResize:
    @pytest.mark.parametrize("align", [True, False])
    @pytest.mark.parametrize("shape", [(2, 8, 8, 3), (1, 7, 13, 2)])
    def test_bilinear_matches_torch(self, rng, align, shape):
        x = rng.randn(*shape).astype(np.float32)
        out_hw = (16, 10)
        ours = interpolate.resize_bilinear(jnp.array(x), out_hw, align_corners=align)
        theirs = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                               size=out_hw, mode="bilinear", align_corners=align)
        theirs = theirs.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)

    def test_trilinear_matches_torch(self, rng):
        x = rng.randn(1, 6, 6, 4, 2).astype(np.float32)
        out = (12, 12, 8)
        ours = interpolate.resize_bilinear(jnp.array(x), out, align_corners=True)
        theirs = F.interpolate(torch.from_numpy(x).permute(0, 4, 1, 2, 3),
                               size=out, mode="trilinear", align_corners=True)
        theirs = theirs.permute(0, 2, 3, 4, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)

    def test_nearest_matches_torch(self, rng):
        x = rng.randn(2, 9, 9, 1).astype(np.float32)
        out_hw = (5, 7)
        ours = interpolate.resize_nearest(jnp.array(x), out_hw)
        theirs = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                               size=out_hw, mode="nearest")
        theirs = theirs.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=0)


class TestGridSample:
    @pytest.mark.parametrize("padding", ["zeros", "border"])
    @pytest.mark.parametrize("mode", ["bilinear", "nearest"])
    def test_2d_matches_torch(self, rng, padding, mode):
        x = rng.randn(2, 8, 10, 3).astype(np.float32)
        grid = (rng.rand(2, 6, 7, 2) * 2.4 - 1.2).astype(np.float32)  # incl. OOB
        ours = interpolate.grid_sample_2d(jnp.array(x), jnp.array(grid),
                                          mode=mode, padding_mode=padding,
                                          align_corners=True)
        theirs = F.grid_sample(torch.from_numpy(x).permute(0, 3, 1, 2),
                               torch.from_numpy(grid), mode=mode,
                               padding_mode=padding, align_corners=True)
        theirs = theirs.permute(0, 2, 3, 1).numpy()
        if mode == "nearest":
            # rounding ties can differ; demand 99.5% exact agreement
            agree = np.mean(np.isclose(np.asarray(ours), theirs, atol=1e-5))
            assert agree > 0.995
        else:
            np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4)

    @pytest.mark.parametrize("padding", ["zeros", "border"])
    def test_3d_matches_torch(self, rng, padding):
        x = rng.randn(1, 5, 6, 7, 2).astype(np.float32)
        grid = (rng.rand(1, 4, 5, 6, 3) * 2.4 - 1.2).astype(np.float32)
        ours = interpolate.grid_sample_3d(jnp.array(x), jnp.array(grid),
                                          padding_mode=padding,
                                          align_corners=True)
        theirs = F.grid_sample(torch.from_numpy(x).permute(0, 4, 1, 2, 3),
                               torch.from_numpy(grid), mode="bilinear",
                               padding_mode=padding, align_corners=True)
        theirs = theirs.permute(0, 2, 3, 4, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4)


class TestSampling:
    def test_stratified_covers_range(self):
        key = jax.random.PRNGKey(0)
        idx = sampling.stratified_indices(key, 1000, 256, shuffle=False)
        assert idx.shape == (256,)
        assert int(idx.min()) >= 0 and int(idx.max()) < 1000
        # stratification: sorted samples must be near-uniformly spread
        gaps = np.diff(np.sort(np.asarray(idx)))
        assert gaps.max() <= 2 * (1000 // 256) + 2

    def test_stratified_lower_variance_than_uniform(self):
        """The paper's point: stratified sampling reduces estimator variance."""
        values = np.linspace(0, 1, 4096) ** 2  # mean = 1/3
        means_s, means_u = [], []
        for i in range(64):
            key = jax.random.PRNGKey(i)
            ks, ku = jax.random.split(key)
            si = np.asarray(sampling.stratified_indices(ks, 4096, 64))
            ui = np.asarray(sampling.uniform_indices(ku, 4096, 64))
            means_s.append(values[si].mean())
            means_u.append(values[ui].mean())
        assert np.var(means_s) < 0.5 * np.var(means_u)

    def test_antithetic_pairs_mirror(self):
        key = jax.random.PRNGKey(3)
        idx = sampling.antithetic_stratified_indices(key, 10000, 128,
                                                     shuffle=False)
        a, b = np.asarray(idx[:64]), np.asarray(idx[64:])
        # pair p lives in block [2p, 2p+2) strata; a+b ~ block span
        block = 10000 / 64
        np.testing.assert_allclose(a + b, (2 * np.arange(64) + 1) * block,
                                   atol=block / 2 + 2)

    def test_small_n_does_not_crash(self):
        key = jax.random.PRNGKey(1)
        for n in [0, 1, 3]:
            idx = sampling.stratified_indices(key, jnp.array(n), 16)
            assert int(idx.max()) <= max(n - 1, 0)
            idx = sampling.antithetic_stratified_indices(key, jnp.array(n), 16)
            assert int(idx.max()) <= max(n - 1, 0)

    def test_sample_from_mask_only_valid(self):
        key = jax.random.PRNGKey(2)
        mask = jnp.array([0, 1, 0, 0, 1, 1, 0, 1, 0, 0], bool)
        idx, n = sampling.sample_from_mask(key, mask, 32)
        assert int(n) == 4
        assert set(np.asarray(idx).tolist()) <= {1, 4, 5, 7}

    def test_ranks_to_flat_raster_order(self):
        mask = jnp.array([1, 0, 1, 1, 0, 1], bool)
        flat = sampling.ranks_to_flat(mask, jnp.array([0, 1, 2, 3]))
        np.testing.assert_array_equal(np.asarray(flat), [0, 2, 3, 5])


class TestRingBuffer:
    def test_enqueue_wraps(self):
        buf = ring_buffer.create(8, 2)
        keys = jnp.arange(12, dtype=jnp.float32).reshape(6, 2)
        buf = ring_buffer.enqueue(buf, keys)
        assert int(buf.count) == 6 and int(buf.ptr) == 6
        buf = ring_buffer.enqueue(buf, keys + 100)
        assert int(buf.count) == 8 and int(buf.ptr) == 4
        # rows 6,7 then wrap to 0..3
        np.testing.assert_allclose(np.asarray(buf.data[6]), [100, 101])
        np.testing.assert_allclose(np.asarray(buf.data[0]), [104, 105])

    def test_enqueue_disabled(self):
        buf = ring_buffer.create(4, 2)
        buf2 = ring_buffer.enqueue(buf, jnp.ones((2, 2)), enable=False)
        assert int(buf2.count) == 0
        np.testing.assert_allclose(np.asarray(buf2.data), 0)

    def test_enqueue_fixed_matches_reference_semantics(self):
        # model_2D.py:203-214: K % B == 0, pointer advances modulo K
        data = jnp.zeros((6, 3))
        ptr = jnp.array(0, jnp.int32)
        for step in range(4):
            keys = jnp.full((2, 3), float(step))
            data, ptr = ring_buffer.enqueue_fixed(data, ptr, keys)
        assert int(ptr) == 2
        np.testing.assert_allclose(np.asarray(data[0]), 3.0)  # wrapped
        np.testing.assert_allclose(np.asarray(data[2]), 1.0)


class TestPatches:
    def test_2d_matches_loop(self, rng):
        x = rng.randn(2, 16, 16, 3).astype(np.float32)
        got = patches.extract_patches_2d(jnp.array(x), patch=8, step=4)
        expect = []
        for i in range(0, 16 - 8 + 1, 4):
            for j in range(0, 16 - 8 + 1, 4):
                expect.append(x[:, i:i + 8, j:j + 8, :])
        expect = np.stack(expect, axis=1)
        assert got.shape == (2, 9, 8, 8, 3)
        np.testing.assert_allclose(np.asarray(got), expect)

    def test_3d_matches_loop(self, rng):
        x = rng.randn(1, 8, 8, 6, 2).astype(np.float32)
        got = patches.extract_patches_3d(jnp.array(x), patch=4, step=2)
        expect = []
        for d in range(0, 8 - 4 + 1, 2):
            for i in range(0, 8 - 4 + 1, 2):
                for j in range(0, 6 - 4 + 1, 2):
                    expect.append(x[:, d:d + 4, i:i + 4, j:j + 4, :])
        expect = np.stack(expect, axis=1)
        np.testing.assert_allclose(np.asarray(got), expect)


class TestGaussian:
    def test_blur_matches_torch_conv(self, rng):
        """Separable blur == the reference's full-2D-kernel depthwise conv."""
        x = rng.randn(2, 16, 16, 2).astype(np.float32)
        sigma, ks = 1.0, 3
        ours = gaussian.gaussian_blur_2d(jnp.array(x), sigma, ks)
        # reference construction (adv_morph.py:457-499)
        coords = torch.arange(ks).float()
        g = torch.exp(-(coords - (ks - 1) / 2.) ** 2 / (2 * sigma ** 2))
        kern2d = torch.outer(g, g)
        kern2d = kern2d / kern2d.sum()
        weight = kern2d.view(1, 1, ks, ks).repeat(2, 1, 1, 1)
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        theirs = F.conv2d(xt, weight, padding=ks // 2, groups=2)
        theirs = theirs.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)

    def test_kernel_size_rule(self):
        assert gaussian.adv_morph_kernel_size(3, 1) == 7
        assert gaussian.adv_morph_kernel_size(41, 1) == 41


class TestPooledPatchGrid:
    """pooled_patch_grid must equal adaptive_avg_pool over every extracted
    patch (the gather-free ISD descriptor path, ops/patches.py)."""

    def _reference(self, x, patch, step, out):
        from arco_tpu.models.layers import adaptive_avg_pool
        from arco_tpu.ops.patches import (extract_patches_2d,
                                          extract_patches_3d)
        nd = x.ndim - 2
        extract = extract_patches_2d if nd == 2 else extract_patches_3d
        patches = extract(x, patch, step)
        b, p = patches.shape[:2]
        folded = patches.reshape((b * p,) + patches.shape[2:])
        pooled = adaptive_avg_pool(folded, out)
        return pooled.reshape((b, p) + pooled.shape[1:])

    def test_2d_non_divisible_windows(self):
        from arco_tpu.ops.patches import pooled_patch_grid
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 30, 22, 3).astype(np.float32))
        got = pooled_patch_grid(x, patch=10, step=5, out_size=7)
        want = self._reference(x, 10, 5, 7)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_3d_isd_grid_shape(self):
        """The ISD 3D configuration at reduced scale: patch 20 step 10
        pool 8 (pretrain_3D.py:165 + ProjectionHead)."""
        from arco_tpu.ops.patches import pooled_patch_grid
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(1, 40, 30, 20, 2).astype(np.float32))
        got = pooled_patch_grid(x, patch=20, step=10, out_size=8)
        want = self._reference(x, 20, 10, 8)
        assert got.shape == want.shape == (1, 3 * 2 * 1, 8, 8, 8, 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_2d_divisible_and_grad(self):
        from arco_tpu.ops.patches import pooled_patch_grid
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(1, 32, 32, 2).astype(np.float32))

        def f_new(v):
            return jnp.sum(pooled_patch_grid(v, 16, 8, 8) ** 2)

        def f_old(v):
            return jnp.sum(self._reference(v, 16, 8, 8) ** 2)

        np.testing.assert_allclose(float(f_new(x)), float(f_old(x)),
                                   rtol=1e-5)
        g_new, g_old = jax.grad(f_new)(x), jax.grad(f_old)(x)
        np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_old),
                                   rtol=1e-4, atol=1e-5)
