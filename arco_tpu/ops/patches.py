"""Loop-free patch-grid extraction.

The reference slides a half-overlap window over the logits with nested Python
loops — 49 iterations in 2D (model_2D.py:265-268) and ~700 in 3D
(model_3D.py:355-359) — each invoking conv heads. Here the grid is one
strided-slice stack; heads are then vmapped over the patch axis, so XLA sees
a single batched program.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def patch_grid_positions(size: int, patch: int, step: int):
    """Start offsets of the reference's ``range(0, size-patch+1, step)``."""
    return list(range(0, size - patch + 1, step))


def extract_patches_2d(x: jnp.ndarray, patch: int, step: int) -> jnp.ndarray:
    """[N, H, W, C] -> [N, P, patch, patch, C] with the same patch ordering
    as the reference's row-major double loop (model_2D.py:265-268)."""
    n, h, w, c = x.shape
    ys = patch_grid_positions(h, patch, step)
    xs = patch_grid_positions(w, patch, step)
    # gather rows then cols by index — one reshape-friendly take per axis
    y_idx = np.array([[y + dy for dy in range(patch)] for y in ys])  # [Py, patch]
    x_idx = np.array([[x0 + dx for dx in range(patch)] for x0 in xs])
    out = x[:, y_idx.reshape(-1), :, :]               # [N, Py*patch, W, C]
    out = out.reshape(n, len(ys), patch, w, c)
    out = out[:, :, :, x_idx.reshape(-1), :]          # [N, Py, patch, Px*patch, C]
    out = out.reshape(n, len(ys), patch, len(xs), patch, c)
    out = out.transpose(0, 1, 3, 2, 4, 5)             # [N, Py, Px, patch, patch, C]
    return out.reshape(n, len(ys) * len(xs), patch, patch, c)


def extract_patches_3d(x: jnp.ndarray, patch: int, step: int) -> jnp.ndarray:
    """[N, D, H, W, C] -> [N, P, p, p, p, C], triple-loop order of
    model_3D.py:355-359 (d-major, then h, then w)."""
    n, d, h, w, c = x.shape
    ds = patch_grid_positions(d, patch, step)
    hs = patch_grid_positions(h, patch, step)
    ws = patch_grid_positions(w, patch, step)

    def take(arr, starts, axis):
        idx = np.array([[s + k for k in range(patch)] for s in starts]).reshape(-1)
        out = jnp.take(arr, idx, axis=axis)
        return out

    out = take(x, ds, 1).reshape(n, len(ds), patch, h, w, c)
    out = take(out, hs, 3).reshape(n, len(ds), patch, len(hs), patch, w, c)
    out = take(out, ws, 5).reshape(n, len(ds), patch, len(hs), patch, len(ws), patch, c)
    out = out.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return out.reshape(n, len(ds) * len(hs) * len(ws), patch, patch, patch, c)


def _pool_bounds(patch: int, out: int):
    """torch AdaptiveAvgPool window bounds within one patch (possibly
    overlapping for non-divisible sizes): [floor(i*p/o), ceil((i+1)*p/o))."""
    s = [int(np.floor(i * patch / out)) for i in range(out)]
    e = [int(np.ceil((i + 1) * patch / out)) for i in range(out)]
    return s, e


def _axis_window_means(x: jnp.ndarray, axis: int, starts, s, e):
    """Replace ``axis`` (length n) with two axes [P, out] holding the mean
    of x over [start+s_i, start+e_i) — via an exclusive prefix sum, so the
    cost is one cumsum + two small index-takes instead of gathering every
    window's pixels. fp32 accumulation: bf16 prefix differences cancel."""
    orig = x.dtype
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 0)
    prefix = jnp.pad(jnp.cumsum(x.astype(jnp.float32), axis=axis), pad)
    lo = np.add.outer(np.asarray(starts), np.asarray(s)).reshape(-1)
    hi = np.add.outer(np.asarray(starts), np.asarray(e)).reshape(-1)
    seg = (jnp.take(prefix, jnp.asarray(hi), axis=axis)
           - jnp.take(prefix, jnp.asarray(lo), axis=axis))
    new_shape = x.shape[:axis] + (len(starts), len(s)) + x.shape[axis + 1:]
    seg = seg.reshape(new_shape)
    lens = np.array([ei - si for si, ei in zip(s, e)], np.float32)
    bshape = [1] * seg.ndim
    bshape[axis + 1] = len(s)
    return (seg / jnp.asarray(lens).reshape(bshape)).astype(orig)


def pooled_patch_grid(x: jnp.ndarray, patch: int, step: int,
                      out_size: int) -> jnp.ndarray:
    """adaptive_avg_pool(extract_patches_nd(x), out_size) computed WITHOUT
    materializing patch pixels: every pooled cell is an axis-aligned box
    mean, so per-axis prefix sums + boundary takes produce [N, P, out^nd, C]
    directly. For the ISD 3D grid (700 overlapping 20^3 patches of a
    [112,112,80] volume, model_3D.py:355-359 + AdaptiveAvgPool) this
    replaces three chained 45M-element gathers, an 8-D transpose, and
    their backward scatters with three cumsums and tiny index-takes.
    Patch ordering matches extract_patches_2d/3d (row-major over the grid);
    means are fp32-accumulated (more accurate than pooling bf16 pixels)."""
    nd = x.ndim - 2
    s, e = _pool_bounds(patch, out_size)
    for axis in range(nd, 0, -1):  # last spatial axis first: earlier axis
        starts = patch_grid_positions(x.shape[axis], patch, step)
        x = _axis_window_means(x, axis, starts, s, e)  # indices stay valid
    n = x.shape[0]
    if nd == 2:
        x = x.transpose(0, 1, 3, 2, 4, 5)
        p = x.shape[1] * x.shape[2]
        return x.reshape(n, p, out_size, out_size, x.shape[-1])
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    p = x.shape[1] * x.shape[2] * x.shape[3]
    return x.reshape(n, p, out_size, out_size, out_size, x.shape[-1])
