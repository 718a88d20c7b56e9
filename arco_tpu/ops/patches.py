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
