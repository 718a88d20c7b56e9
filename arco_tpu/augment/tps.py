"""Thin-plate-spline random warps, fully on device.

Parity targets:
- TPSGridGen (tps_stn_pytorch/tps_grid_gen.py:23-71): precomputed inverse TPS
  kernel (N+3, N+3) and radial-basis representation of the target grid;
  forward = two matmuls.
- RandTPS (tps/rand_tps.py:82-170): 25 control points on a 5x5 grid in
  [-1,1]^2, sigma-perturbed, composed with a random similarity transform
  (generate_transformer_matrices, rand_tps.py:52-79), optional random mirror,
  sampled with grid_sample.
- 3D variant (tps/rand_tps_3d.py:147-167): the reference applies the same 2D
  TPS to every depth slice; here the grid broadcasts over depth in one
  grid_sample_3d call — no Python loop.

The grid is regenerated each training iteration (reset_control_points at
train_arco_2d.py:412) — here `make_rand_tps_grid(rng, ...)` is a pure
function of the PRNG key.
"""

from __future__ import annotations

import itertools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from arco_tpu.ops.interpolate import grid_sample_2d, grid_sample_3d


def _partial_repr(points_a: np.ndarray, points_b: np.ndarray) -> np.ndarray:
    """phi(r) = 0.5 * r^2 * log(r^2) radial basis (tps_grid_gen.py:9-21)."""
    diff = points_a[:, None, :] - points_b[None, :, :]
    dist2 = (diff ** 2).sum(-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        rep = 0.5 * dist2 * np.log(dist2)
    return np.nan_to_num(rep, nan=0.0, posinf=0.0, neginf=0.0)


class TPSGridGen:
    """Precomputes the TPS solve for a fixed target grid; __call__ maps
    batched source control points to a sampling grid (two matmuls)."""

    def __init__(self, target_height: int, target_width: int,
                 target_control_points: np.ndarray):
        n = target_control_points.shape[0]
        self.num_points = n
        tcp = np.asarray(target_control_points, np.float32)

        forward_kernel = np.zeros((n + 3, n + 3), np.float32)
        forward_kernel[:n, :n] = _partial_repr(tcp, tcp)
        forward_kernel[:n, -3] = 1.0
        forward_kernel[-3, :n] = 1.0
        forward_kernel[:n, -2:] = tcp
        forward_kernel[-2:, :n] = tcp.T
        inverse_kernel = np.linalg.inv(forward_kernel)

        hw = target_height * target_width
        yx = np.array(list(itertools.product(range(target_height),
                                             range(target_width))), np.float32)
        y = yx[:, 0:1] * 2 / (target_height - 1) - 1
        x = yx[:, 1:2] * 2 / (target_width - 1) - 1
        target_coordinate = np.concatenate([x, y], axis=1)  # (x, y) order
        repr_mat = np.concatenate([
            _partial_repr(target_coordinate, tcp), np.ones((hw, 1), np.float32),
            target_coordinate], axis=1)

        # kept as HOST numpy: a device-resident [H*W, N+3] matrix becomes a
        # closure-captured constant of every jitted step, and .lower() then
        # has to fetch it device->host to emit the IR literal — a transfer
        # the tunneled backend can fail with RESOURCE_EXHAUSTED. As numpy it
        # lowers directly and XLA stages it to HBM once at compile time.
        self.inverse_kernel = np.asarray(inverse_kernel)
        self.target_coordinate_repr = np.asarray(repr_mat)
        self.target_height = target_height
        self.target_width = target_width

    def __call__(self, source_control_points: jnp.ndarray) -> jnp.ndarray:
        """[B, N, 2] -> sampling grid [B, H, W, 2] in torch grid convention."""
        b = source_control_points.shape[0]
        pad = jnp.zeros((b, 3, 2), source_control_points.dtype)
        y = jnp.concatenate([source_control_points, pad], axis=1)
        mapping = jnp.einsum("ij,bjk->bik", self.inverse_kernel, y,
                             precision=jax.lax.Precision.HIGHEST)
        coords = jnp.einsum("hj,bjk->bhk", self.target_coordinate_repr,
                            mapping, precision=jax.lax.Precision.HIGHEST)
        return coords.reshape(b, self.target_height, self.target_width, 2)


def default_control_points() -> np.ndarray:
    """5x5 grid over [-1,1]^2 in itertools.product order
    (rand_tps.py:101-104)."""
    axis = np.arange(-1.0, 1.00001, 2.0 / 4)
    return np.array(list(itertools.product(axis, axis)), np.float32)


def _similarity_theta(rng, batch_size: int, translate: float = 0.1,
                      random_scale=(0.8, 1.2), rotate: float = 60.0):
    """Random similarity matrices, reference construction at
    rand_tps.py:52-79 with img_sz=2.0 (normalized coords). Note RandTPS
    inverts the scale range because the warp maps target->source
    (rand_tps.py:90)."""
    k_a, k_s, k_tx, k_ty = jax.random.split(rng, 4)
    inv_scale = (1.0 / random_scale[1], 1.0 / random_scale[0])
    angle = jax.random.uniform(k_a, (batch_size,), minval=-rotate,
                               maxval=rotate) / 180.0 * jnp.pi
    scale = jax.random.uniform(k_s, (batch_size,), minval=inv_scale[0],
                               maxval=inv_scale[1])
    tx = jax.random.uniform(k_tx, (batch_size,), minval=-translate,
                            maxval=translate)
    ty = jax.random.uniform(k_ty, (batch_size,), minval=-translate,
                            maxval=translate)
    img_sz = 2.0
    cos_v = scale * jnp.cos(angle)
    sin_v = scale * jnp.sin(angle)
    theta = jnp.stack([cos_v, -sin_v, tx * img_sz / 2.0,
                       sin_v, cos_v, ty * img_sz / 2.0], axis=1)
    return theta.reshape(batch_size, 2, 3)


def make_rand_tps_grid(rng, gridgen: TPSGridGen, batch_size: int,
                       sigma: float = 0.01, random_mirror: bool = True,
                       random_scale=(0.8, 1.2), mode: str = "affine"):
    """One fresh random TPS sampling grid [B, H, W, 2]
    (RandTPS.reset_control_points, rand_tps.py:110-148)."""
    k_pert, k_aff, k_mir = jax.random.split(rng, 3)
    tcp = jnp.asarray(default_control_points())
    scp = jnp.broadcast_to(tcp, (batch_size,) + tcp.shape)
    scp = scp + jax.random.uniform(k_pert, scp.shape, minval=-sigma,
                                   maxval=sigma)
    if mode == "affine":
        theta = _similarity_theta(k_aff, batch_size,
                                  random_scale=random_scale)
        ones = jnp.ones((*scp.shape[:2], 1), scp.dtype)
        scp = jnp.matmul(jnp.concatenate([scp, ones], axis=2),
                         jnp.transpose(theta, (0, 2, 1)),
                         precision=jax.lax.Precision.HIGHEST)
    if random_mirror:
        flip = jax.random.bernoulli(k_mir)  # one draw for the whole batch
        scp = scp.at[:, :, 0].set(jnp.where(flip, -scp[:, :, 0],
                                            scp[:, :, 0]))
    return gridgen(scp)


class RandTPS:
    """Stateful convenience wrapper mirroring the reference class.

    Usage inside a jitted step: grid = tps.reset(rng); tps.apply(x, grid).
    """

    def __init__(self, width: int, height: int, batch_size: int,
                 sigma: float = 0.01, border_padding: bool = False,
                 random_mirror: bool = True, random_scale=(0.8, 1.2),
                 mode: str = "affine"):
        self.gridgen = TPSGridGen(height, width, default_control_points())
        self.batch_size = batch_size
        self.sigma = sigma
        self.padding_mode = "border" if border_padding else "zeros"
        self.random_mirror = random_mirror
        self.random_scale = random_scale
        self.mode = mode

    def reset(self, rng) -> jnp.ndarray:
        return make_rand_tps_grid(rng, self.gridgen, self.batch_size,
                                  self.sigma, self.random_mirror,
                                  self.random_scale, self.mode)

    def apply(self, x: jnp.ndarray, grid: jnp.ndarray,
              padding_mode: str | None = None, mode: str = "bilinear"):
        pm = padding_mode or self.padding_mode
        if x.ndim == 4:
            return grid_sample_2d(x, grid, mode=mode, padding_mode=pm,
                                  align_corners=True)
        # 3D: the same 2D grid warps each depth slice (rand_tps_3d.py:147-167).
        # The z coordinate is the identity, so a trilinear 3D gather is
        # degenerate — half its taps carry weight 0. Fold depth into the
        # channel axis and run ONE 2D gather: 4 taps instead of 8, no
        # full-volume [B,H,W,D,C]<->[B,D,H,W,C] relayouts. This leg was 43%
        # of the exact-parity 3D step (docs/PERF.md, VERDICT r2 item 3).
        assert x.ndim == 5
        b, h, w, d, c = x.shape  # [B, H, W, D, C]
        flat = x.reshape(b, h, w, d * c)
        out = grid_sample_2d(flat, grid, mode=mode, padding_mode=pm,
                             align_corners=True)
        return out.reshape(b, out.shape[1], out.shape[2], d, c)
