"""Fully on-device 3D sliding-window inference.

The host-accumulated version (eval/sliding_window.py) already batches
windows; this variant compiles the WHOLE case — window gather, batched
forward (lax.map over window chunks), score scatter-add, count
normalization, argmax — into one XLA program per (volume-shape, grid)
signature. Zero host round-trips per case beyond the final label map.

Parity: identical window grid and score averaging as test_util.py:139-211;
jit cache is keyed on the padded volume shape, so datasets with a few
distinct volume sizes compile a handful of programs (LA volumes are
uniformly sized after preprocessing).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from arco_tpu.eval.sliding_window import window_starts


def make_device_case_fn(predict_fn: Callable, vol_shape, patch_size,
                        stride_xy: int, stride_z: int, num_classes: int,
                        window_batch: int = 4):
    """Build a jitted volume -> (label_map, score_map) function.

    predict_fn: [B, *patch, 1] -> softmax [B, *patch, K] (pure fn, traced
    inside).
    """
    w, h, d = vol_shape
    pw, ph, pd = (max(patch_size[0] - w, 0), max(patch_size[1] - h, 0),
                  max(patch_size[2] - d, 0))
    pads = ((pw // 2, pw - pw // 2), (ph // 2, ph - ph // 2),
            (pd // 2, pd - pd // 2))
    ww, hh, dd = w + pw, h + ph, d + pd

    xs = window_starts(ww, patch_size[0], stride_xy)
    ys = window_starts(hh, patch_size[1], stride_xy)
    zs = window_starts(dd, patch_size[2], stride_z)
    coords = np.array([(x, y, z) for x in xs for y in ys for z in zs],
                      np.int32)
    n_win = len(coords)
    pad_n = (-n_win) % window_batch
    coords_padded = np.concatenate(
        [coords, np.zeros((pad_n, 3), np.int32)]) if pad_n else coords
    chunks = coords_padded.reshape(-1, window_batch, 3)
    valid = np.concatenate([np.ones(n_win, bool),
                            np.zeros(pad_n, bool)]).reshape(
        -1, window_batch)

    @jax.jit
    def run(volume):
        vol = jnp.pad(volume, pads)

        def chunk_body(carry, inp):
            score, cnt = carry
            cks, ok = inp                        # [Wb, 3], [Wb]
            windows = jax.vmap(lambda c: jax.lax.dynamic_slice(
                vol, (c[0], c[1], c[2]), patch_size))(cks)
            probs = predict_fn(windows[..., None])   # [Wb, *patch, K]
            probs = probs * ok[:, None, None, None, None]

            def scatter(sc, c, p):
                return jax.lax.dynamic_update_slice(
                    sc, jax.lax.dynamic_slice(
                        sc, (c[0], c[1], c[2], 0),
                        patch_size + (num_classes,)) + p,
                    (c[0], c[1], c[2], 0))

            def cnt_scatter(cn, c, o):
                block = jax.lax.dynamic_slice(cn, (c[0], c[1], c[2]),
                                              patch_size)
                return jax.lax.dynamic_update_slice(
                    cn, block + o.astype(jnp.float32), (c[0], c[1], c[2]))

            for i in range(window_batch):
                score = scatter(score, cks[i], probs[i])
                cnt = cnt_scatter(cnt, cks[i], ok[i])
            return (score, cnt), None

        score0 = jnp.zeros((ww, hh, dd, num_classes), jnp.float32)
        cnt0 = jnp.zeros((ww, hh, dd), jnp.float32)
        (score, cnt), _ = jax.lax.scan(
            chunk_body, (score0, cnt0),
            (jnp.asarray(chunks), jnp.asarray(valid)))
        score = score / jnp.maximum(cnt, 1.0)[..., None]
        sl = tuple(slice(p[0], p[0] + s) for p, s in zip(pads, vol_shape))
        score = score[sl]
        return jnp.argmax(score, axis=-1).astype(jnp.int32), score

    return run


def test_single_case_3d_device(predict_fn, image: np.ndarray,
                               stride_xy: int, stride_z: int, patch_size,
                               num_classes: int, window_batch: int = 4):
    """Drop-in for eval.sliding_window.test_single_case_3d, on device."""
    fn = make_device_case_fn(predict_fn, tuple(image.shape),
                             tuple(patch_size), stride_xy, stride_z,
                             num_classes, window_batch)
    label_map, score = fn(jnp.asarray(image.astype(np.float32)))
    return np.asarray(label_map), np.moveaxis(np.asarray(score), -1, 0)
