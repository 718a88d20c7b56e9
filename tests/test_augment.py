"""Tests for device-side augmentations: TPS golden parity vs the reference
torch implementation, AdvMorph properties, mixing mask semantics."""

import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arco_tpu.augment import mixing, morph, photometric, tps

torch = pytest.importorskip("torch")

REF = "/root/reference/code"


def _load_ref(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestTPSGridGen:
    def test_grid_matches_reference(self, rng):
        ref = _load_ref("ref_tps", f"{REF}/tps_stn_pytorch/tps_grid_gen.py")
        tcp = tps.default_control_points()
        ours_gen = tps.TPSGridGen(12, 10, tcp)
        theirs_gen = ref.TPSGridGen(12, 10, torch.from_numpy(tcp))
        scp = tcp[None] + rng.randn(1, 25, 2).astype(np.float32) * 0.05
        ours = np.asarray(ours_gen(jnp.array(scp)))
        theirs = theirs_gen(torch.from_numpy(scp)).view(1, 12, 10, 2).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-4)

    def test_identity_control_points_give_identity_grid(self):
        tcp = tps.default_control_points()
        gen = tps.TPSGridGen(8, 8, tcp)
        grid = np.asarray(gen(jnp.array(tcp[None])))
        xs = np.linspace(-1, 1, 8)
        np.testing.assert_allclose(grid[0, 0, :, 0], xs, atol=1e-4)
        np.testing.assert_allclose(grid[0, :, 0, 1], xs, atol=1e-4)


class TestRandTPS:
    def test_apply_2d_shapes_and_determinism(self):
        t = tps.RandTPS(16, 16, batch_size=4, sigma=0.01)
        g1 = t.reset(jax.random.PRNGKey(0))
        g2 = t.reset(jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2))
        x = jnp.ones((4, 16, 16, 2))
        out = t.apply(x, g1)
        assert out.shape == x.shape

    def test_sigma_zero_no_affine_is_near_identity(self):
        t = tps.RandTPS(16, 16, batch_size=1, sigma=0.0, random_mirror=False,
                        mode="none")
        grid = t.reset(jax.random.PRNGKey(0))
        x = jnp.arange(16 * 16, dtype=jnp.float32).reshape(1, 16, 16, 1)
        out = t.apply(x, grid)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-2)

    def test_apply_3d_warps_slicewise(self):
        t = tps.RandTPS(8, 8, batch_size=2, sigma=0.05)
        grid = t.reset(jax.random.PRNGKey(1))
        x = jnp.broadcast_to(
            jnp.arange(8 * 8, dtype=jnp.float32).reshape(1, 8, 8, 1, 1),
            (2, 8, 8, 4, 1))
        out = t.apply(x, grid)
        assert out.shape == (2, 8, 8, 4, 1)
        # same 2D warp on every depth slice (rand_tps_3d.py:147-167)
        np.testing.assert_allclose(np.asarray(out[:, :, :, 0, 0]),
                                   np.asarray(out[:, :, :, 3, 0]), atol=1e-4)

    def test_apply_3d_equals_per_slice_2d(self):
        """The depth-folded single 2D gather must equal an explicit 2D warp
        of every depth slice — the reference's loop semantics
        (rand_tps_3d.py:147-167) — for distinct per-slice content."""
        from arco_tpu.ops.interpolate import grid_sample_2d
        t = tps.RandTPS(10, 12, batch_size=2, sigma=0.05)
        grid = t.reset(jax.random.PRNGKey(7))
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 10, 12, 5, 3).astype(np.float32))
        out = t.apply(x, grid, padding_mode="zeros")
        for dd in range(5):
            ref = grid_sample_2d(x[:, :, :, dd, :], grid,
                                 padding_mode="zeros", align_corners=True)
            np.testing.assert_allclose(np.asarray(out[:, :, :, dd, :]),
                                       np.asarray(ref), atol=1e-6)


class TestAdvMorph:
    def test_field_exponentiation_matches_reference(self, rng):
        """The reference's integrate_by_add mutates its grid argument in
        place, biasing its output by -duv/2^n (see morph.py docstring); the
        comparison corrects for that quirk."""
        ref = _load_ref("ref_adv", f"{REF}/adv_morph.py")
        duv = rng.randn(1, 2, 8, 8).astype(np.float32) * 0.1
        nb = 4
        theirs = ref.vectorFieldExponentiation2D(
            torch.from_numpy(duv), nb_steps=nb, use_gpu=False).numpy()
        theirs_corrected = theirs + duv / (2.0 ** nb)
        ours = morph.field_exponentiation(
            jnp.array(duv.transpose(0, 2, 3, 1)), nb_steps=nb)
        ours = np.asarray(ours).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours, theirs_corrected, atol=1e-4)

    def test_zero_velocity_is_identity(self, rng):
        m = morph.AdvMorph(data_size=(2, 16, 16, 1), vector_size=(2, 2))
        params = morph.AdvMorphParams(velocity=jnp.zeros((2, 2, 2, 2)))
        grid = m.deformation_grid(params)
        x = jnp.array(rng.randn(2, 16, 16, 1).astype(np.float32))
        out = m.transform(x, grid)
        # repeated bilinear compositions accumulate a few ulp of coordinate
        # error; 5e-3 on randn data bounds the interpolation leakage
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=5e-3)

    def test_unit_normalize_matches_reference(self, rng):
        ref = _load_ref("ref_adv2", f"{REF}/adv_morph.py")
        base = ref.AdvMorph(config_dict={
            "epsilon": 1.5, "xi": 0.5, "data_size": [3, 1, 4, 4],
            "vector_size": [2, 2], "interpolator_mode": "bilinear"},
            use_gpu=False, debug=False)
        d = rng.randn(3, 2, 4, 4).astype(np.float32)
        theirs = base.unit_normalize(torch.from_numpy(d)).numpy()
        ours = np.asarray(morph.unit_normalize(jnp.array(d)))
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_coarse_exp_matches_fullres_exponentiation(self, rng):
        """TPU optimization check: integrating the band-limited velocity
        field at 2x vector resolution then upsampling must produce nearly
        the same deformation grid as full-resolution integration."""
        kw = dict(data_size=(2, 64, 64, 1), vector_size=(8, 8))
        m_c = morph.AdvMorph(coarse_exp=True, **kw)
        m_f = morph.AdvMorph(coarse_exp=False, **kw)
        params = m_c.init_params(jax.random.PRNGKey(3))
        g_c = np.asarray(m_c.deformation_grid(params))
        g_f = np.asarray(m_f.deformation_grid(params))
        ident = np.asarray(morph.base_grid(2, 64, 64))
        d_c, d_f = g_c - ident, g_f - ident
        mag_f = np.abs(d_f).max()
        assert mag_f > 1e-3  # the field actually deforms
        # distributional equivalence (SURVEY §7.3 #2): same deformation
        # family — comparable magnitude, comparable smoothness, pointwise
        # deviation bounded by the deformation scale itself
        assert 0.7 < np.abs(d_c).max() / mag_f < 1.3
        assert np.abs(g_c - g_f).max() < 0.5 * mag_f
        grad = lambda d: np.abs(np.diff(d, axis=1)).max()
        assert 0.5 < grad(d_c) / grad(d_f) < 2.0

    def test_forward_deforms_but_stays_bounded(self, rng):
        x = jnp.array(rng.rand(2, 32, 32, 1).astype(np.float32))
        m = morph.AdvMorph(data_size=(2, 32, 32, 1), vector_size=(4, 4))
        out = m.forward(jax.random.PRNGKey(0), x)
        assert out.shape == x.shape
        assert not np.allclose(np.asarray(out), np.asarray(x))
        assert float(jnp.max(jnp.abs(out))) <= float(jnp.max(jnp.abs(x))) + 1e-3


class TestMixing:
    def test_cutout_area_and_void(self, rng):
        key = jax.random.PRNGKey(0)
        data = jnp.ones((4, 32, 32, 1))
        target = jnp.zeros((4, 32, 32), jnp.int32) + 2
        logits = jnp.ones((4, 32, 32))
        nd, nt, nl = mixing.generate_unsup_data(key, data, target, logits,
                                                mode="cutout")
        # cut region: data zeroed, labels voided to -1
        cut = np.asarray(nt[0]) == -1
        assert 0.2 < cut.mean() < 0.8  # ~half the area (ratio=2)
        assert np.all(np.asarray(nd[0])[cut] == 0)

    def test_cutmix_mixes_neighbor(self, rng):
        key = jax.random.PRNGKey(1)
        data = jnp.stack([jnp.full((16, 16, 1), float(i)) for i in range(3)])
        target = jnp.stack([jnp.full((16, 16), i, jnp.int32)
                            for i in range(3)])
        logits = jnp.ones((3, 16, 16))
        nd, nt, _ = mixing.generate_unsup_data(key, data, target, logits,
                                               mode="cutmix")
        vals = set(np.unique(np.asarray(nt[0])).tolist())
        assert vals <= {0, 1} and len(vals) == 2  # sample 0 mixed with 1

    def test_classmix_selects_half_classes(self):
        key = jax.random.PRNGKey(2)
        labels = jnp.array(np.arange(16).reshape(4, 4) % 4, jnp.int32)
        mask = mixing.generate_class_mask(key, labels, num_classes=4)
        # exactly 2 of 4 present classes selected
        sel = {int(c) for c in range(4)
               if np.asarray(mask)[np.asarray(labels) == c].all()}
        unsel = {int(c) for c in range(4)
                 if (np.asarray(mask)[np.asarray(labels) == c] == 0).all()}
        assert len(sel) == 2 and len(unsel) == 2

    def test_cutout_3d_slab(self):
        key = jax.random.PRNGKey(3)
        m = mixing.generate_cutout_mask_3d(key, (16, 16, 8))
        m = np.asarray(m)
        assert m.shape == (16, 16, 8)
        assert (m == 0).any() and (m == 1).any()
        # zero region restricted to a z-slab
        zero_z = np.where((m == 0).any(axis=(0, 1)))[0]
        assert len(zero_z) < 8


class TestPhotometric:
    def test_batch_photometric_shapes_and_range(self, rng):
        imgs = jnp.array(rng.rand(4, 16, 16, 1).astype(np.float32))
        out = photometric.batch_photometric(jax.random.PRNGKey(0), imgs)
        assert out.shape == imgs.shape
        assert float(out.min()) >= 0.0

    def test_color_jitter_identity_ranges(self, rng):
        img = jnp.array(rng.rand(8, 8, 1).astype(np.float32))
        out = photometric.color_jitter(jax.random.PRNGKey(0), img,
                                       brightness=(1.0, 1.0),
                                       contrast=(1.0, 1.0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                                   atol=1e-6)
