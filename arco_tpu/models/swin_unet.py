"""Swin-UNet: hierarchical shifted-window transformer encoder-decoder.

Parity target: networks/swin_transformer_unet_skip_expand_decoder_sys.py:599
(SwinTransformerSys) + networks/vision_transformer.py:24 (SwinUnet wrapper):
patch embed 4x4, embed dim 96, encoder depths [2,2,2,2] with window
attention (window 7 in the reference, configurable here so it divides the
feature size), patch-merging downsampling, symmetric decoder with
patch-expanding upsampling and skip concatenation, 4x final expand + 1x1
head. Relative position bias included.

ImageNet-pretrained weights are not downloadable (zero egress).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def window_partition(x, ws: int):
    """[B, H, W, C] -> [B*nW, ws*ws, C]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(windows, ws: int, h: int, w: int):
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


def relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))
    coords = coords.reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        bw, n, c = x.shape
        ws = self.window_size
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype)(x)
        qkv = qkv.reshape(bw, n, 3, self.num_heads, head_dim)
        q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
        attn = (q @ k.transpose(0, 1, 3, 2)) * (head_dim ** -0.5)

        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * ws - 1) ** 2, self.num_heads))
        idx = jnp.asarray(relative_position_index(ws)).reshape(-1)
        bias = bias_table[idx].reshape(n, n, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, self.num_heads, n, n) \
                + mask[None, :, None]
            attn = attn.reshape(bw, self.num_heads, n, n)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
            self.dtype)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(bw, n, c)
        return nn.Dense(self.dim, dtype=self.dtype)(out)


def shift_mask(h: int, w: int, ws: int, shift: int) -> jnp.ndarray:
    img = np.zeros((1, h, w, 1))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wsl, :] = cnt
            cnt += 1
    windows = window_partition(jnp.asarray(img), ws).reshape(-1, ws * ws)
    diff = windows[:, None, :] - windows[:, :, None]
    return jnp.where(diff != 0, -100.0, 0.0)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int = 0
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ws = min(self.window_size, h, w)
        shift = self.shift if ws < min(h, w) else 0
        shortcut = x
        x = nn.LayerNorm(dtype=self.dtype)(x)
        # pad to window multiples BEFORE the cyclic shift (official Swin
        # ordering: pad -> roll -> partition; padding after the roll would
        # misalign the shift mask's regions with the wrapped rows and let
        # opposite image edges attend unmasked). The reference requires
        # img_size/window compatibility (224/7); padding makes any
        # resolution work, e.g. 224 with the zoo's window 8 -> 28x28 stage.
        ph = (-h) % ws
        pw = (-w) % ws
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        hp, wp = h + ph, w + pw
        if shift:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        windows = window_partition(x, ws)
        mask = shift_mask(hp, wp, ws, shift) if shift else None
        attn = WindowAttention(self.dim, self.num_heads, ws,
                               self.dtype)(windows, mask)
        x = window_reverse(attn, ws, hp, wp)
        if shift:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        if ph or pw:
            x = x[:, :h, :w]
        x = shortcut + x
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype)(y)
        return x + y


class PatchMerging(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype)(x)


class PatchExpand(nn.Module):
    dim: int
    scale: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        out_c = self.dim // self.scale if self.scale == 2 else self.dim
        x = nn.Dense(out_c * self.scale ** 2, use_bias=False,
                     dtype=self.dtype)(x)
        x = x.reshape(b, h, w, self.scale, self.scale, out_c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, h * self.scale, w * self.scale, out_c)
        return nn.LayerNorm(dtype=self.dtype)(x)


class SwinUnet(nn.Module):
    """SwinTransformerSys parity; returns the ARCO contract."""
    img_size: int = 224
    num_classes: int = 4
    in_chns: int = 1
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        # patch embed 4x4
        h = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4),
                    dtype=self.dtype)(x)
        h = nn.LayerNorm(dtype=self.dtype)(h)

        skips = []
        dim = self.embed_dim
        for stage, depth in enumerate(self.depths):
            for blk in range(depth):
                h = SwinBlock(dim, self.num_heads[stage], self.window_size,
                              shift=0 if blk % 2 == 0 else
                              self.window_size // 2, dtype=self.dtype)(h)
            skips.append(h)
            if stage < len(self.depths) - 1:
                h = PatchMerging(dim, self.dtype)(h)
                dim *= 2
        latent = h

        # decoder: expand + skip concat + blocks
        for stage in range(len(self.depths) - 2, -1, -1):
            h = PatchExpand(dim, 2, self.dtype)(h)
            dim //= 2
            h = jnp.concatenate([h, skips[stage]], axis=-1)
            h = nn.Dense(dim, dtype=self.dtype)(h)
            for blk in range(self.depths[stage]):
                h = SwinBlock(dim, self.num_heads[stage], self.window_size,
                              shift=0 if blk % 2 == 0 else
                              self.window_size // 2, dtype=self.dtype)(h)

        # final 4x expand + head (FinalPatchExpand_X4)
        b, hh, ww, c = h.shape
        h = nn.Dense(16 * c, use_bias=False, dtype=self.dtype)(h)
        h = h.reshape(b, hh, ww, 4, 4, c)
        h = h.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh * 4, ww * 4, c)
        h = nn.LayerNorm(dtype=self.dtype)(h)
        logits = nn.Conv(self.num_classes, (1, 1), use_bias=False,
                         dtype=self.dtype)(h)
        return logits, latent, skips
