"""Resize and grid-sample primitives (NHWC / NDHWC, TPU-friendly gathers).

Parity targets in the reference:
- `F.interpolate(mode='bilinear'|'nearest'|'trilinear')` used for feature
  fusion and mask resizing (model_2D.py:43, train_arco_2d.py:349-393).
- `F.grid_sample(align_corners=True, padding_mode='zeros'|'border')` used by
  TPS warps and adversarial morphing (tps/grid_sample.py:11-20,
  adv_morph.py:558-573).

All functions are channels-last and jit/vmap safe with static shapes. The
bilinear gathers are expressed as one-hot matmuls along each axis where the
output grid is separable (resize), and flat gathers where it is not
(grid_sample) — both map well onto TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ------------------------------------------------------------------- resize

def _resize_weights(in_size: int, out_size: int, align_corners: bool):
    """Bilinear interpolation weight matrix W[out,in] along one axis."""
    if out_size == in_size:
        return jnp.eye(out_size, dtype=jnp.float32)
    if align_corners and out_size > 1:
        src = jnp.arange(out_size, dtype=jnp.float32) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
        src = jnp.clip(src, 0.0, in_size - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    frac = src - lo
    w = (jax.nn.one_hot(lo, in_size) * (1.0 - frac)[:, None]
         + jax.nn.one_hot(hi, in_size) * frac[:, None])
    return w


def resize_bilinear(x: jnp.ndarray, out_spatial, align_corners: bool = True):
    """Bilinear (2D) / trilinear (3D) resize of a channels-last batch.

    x: [N, *spatial, C]; out_spatial: tuple of len 2 or 3.
    Matches torch F.interpolate semantics for both align_corners settings.
    """
    spatial = x.shape[1:-1]
    assert len(spatial) == len(out_spatial)
    dtype = x.dtype
    y = x.astype(jnp.float32)
    for axis, (s_in, s_out) in enumerate(zip(spatial, out_spatial), start=1):
        if s_in == s_out:
            continue
        w = _resize_weights(s_in, s_out, align_corners)
        y = jnp.moveaxis(y, axis, -1)
        y = jnp.matmul(y, w.T, precision=jax.lax.Precision.HIGHEST)
        y = jnp.moveaxis(y, -1, axis)
    return y.astype(dtype)


def resize_nearest(x: jnp.ndarray, out_spatial):
    """Nearest-neighbor resize, matching torch F.interpolate(mode='nearest')
    and scipy.ndimage.zoom(order=0) index rounding used by
    randomGeneratorWithLogits (augment.py:339-365)."""
    spatial = x.shape[1:-1]
    y = x
    for axis, (s_in, s_out) in enumerate(zip(spatial, out_spatial), start=1):
        if s_in == s_out:
            continue
        idx = jnp.floor(jnp.arange(s_out) * (s_in / s_out)).astype(jnp.int32)
        idx = jnp.clip(idx, 0, s_in - 1)
        y = jnp.take(y, idx, axis=axis)
    return y


# -------------------------------------------------------------- grid sample

def _unnormalize(coord, size, align_corners: bool):
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def grid_sample_2d(x: jnp.ndarray, grid: jnp.ndarray, mode: str = "bilinear",
                   padding_mode: str = "zeros", align_corners: bool = True):
    """torch.nn.functional.grid_sample parity for 2D, channels-last.

    x: [N, H, W, C]; grid: [N, Hg, Wg, 2] with grid[..., 0]=x (width) and
    grid[..., 1]=y (height) in [-1, 1].
    """
    n, h, w, c = x.shape
    gx = _unnormalize(grid[..., 0].astype(jnp.float32), w, align_corners)
    gy = _unnormalize(grid[..., 1].astype(jnp.float32), h, align_corners)

    if padding_mode == "border":
        gx = jnp.clip(gx, 0.0, w - 1)
        gy = jnp.clip(gy, 0.0, h - 1)

    if mode == "nearest":
        ix = jnp.round(gx).astype(jnp.int32)
        iy = jnp.round(gy).astype(jnp.int32)
        valid = ((ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1))
        ixc = jnp.clip(ix, 0, w - 1)
        iyc = jnp.clip(iy, 0, h - 1)
        flat = x.reshape(n, h * w, c)
        idx = iyc * w + ixc
        out = jnp.take_along_axis(flat, idx.reshape(n, -1, 1), axis=1)
        out = out.reshape(n, *grid.shape[1:3], c)
        if padding_mode == "zeros":
            out = out * valid[..., None].astype(out.dtype)
        return out

    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx = gx - x0
    wy = gy - y0

    flat = x.reshape(n, h * w, x.shape[-1]).astype(jnp.float32)

    def corner(ix, iy, weight):
        valid = ((ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1))
        ixc = jnp.clip(ix, 0, w - 1)
        iyc = jnp.clip(iy, 0, h - 1)
        idx = iyc * w + ixc
        vals = jnp.take_along_axis(flat, idx.reshape(n, -1, 1), axis=1)
        vals = vals.reshape(n, *grid.shape[1:3], x.shape[-1])
        wgt = weight * valid.astype(jnp.float32)
        return vals * wgt[..., None]

    out = (corner(x0, y0, (1 - wx) * (1 - wy))
           + corner(x1, y0, wx * (1 - wy))
           + corner(x0, y1, (1 - wx) * wy)
           + corner(x1, y1, wx * wy))
    return out.astype(x.dtype)


def grid_sample_3d(x: jnp.ndarray, grid: jnp.ndarray, mode: str = "bilinear",
                   padding_mode: str = "zeros", align_corners: bool = True):
    """torch grid_sample parity for 3D (trilinear), channels-last.

    x: [N, D, H, W, C]; grid: [N, Dg, Hg, Wg, 3] with the torch ordering
    grid[..., 0]=x (width), grid[..., 1]=y (height), grid[..., 2]=z (depth).
    """
    n, d, h, w, c = x.shape
    gx = _unnormalize(grid[..., 0].astype(jnp.float32), w, align_corners)
    gy = _unnormalize(grid[..., 1].astype(jnp.float32), h, align_corners)
    gz = _unnormalize(grid[..., 2].astype(jnp.float32), d, align_corners)

    if padding_mode == "border":
        gx = jnp.clip(gx, 0.0, w - 1)
        gy = jnp.clip(gy, 0.0, h - 1)
        gz = jnp.clip(gz, 0.0, d - 1)

    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    z0 = jnp.floor(gz).astype(jnp.int32)
    wx, wy, wz = gx - x0, gy - y0, gz - z0

    flat = x.reshape(n, d * h * w, c).astype(jnp.float32)
    out_spatial = grid.shape[1:4]

    out = jnp.zeros((n, *out_spatial, c), jnp.float32)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                ix, iy, iz = x0 + dx, y0 + dy, z0 + dz
                weight = ((wx if dx else 1 - wx)
                          * (wy if dy else 1 - wy)
                          * (wz if dz else 1 - wz))
                valid = ((ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
                         & (iz >= 0) & (iz <= d - 1))
                ixc = jnp.clip(ix, 0, w - 1)
                iyc = jnp.clip(iy, 0, h - 1)
                izc = jnp.clip(iz, 0, d - 1)
                idx = (izc * h + iyc) * w + ixc
                vals = jnp.take_along_axis(flat, idx.reshape(n, -1, 1), axis=1)
                vals = vals.reshape(n, *out_spatial, c)
                out = out + vals * (weight * valid.astype(jnp.float32))[..., None]
    return out.astype(x.dtype)
