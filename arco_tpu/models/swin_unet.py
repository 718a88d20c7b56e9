"""Swin-UNet: hierarchical shifted-window transformer encoder-decoder.

Parity target: networks/swin_transformer_unet_skip_expand_decoder_sys.py:599
(SwinTransformerSys) + networks/vision_transformer.py:24 (SwinUnet wrapper):
patch embed 4x4, embed dim 96, encoder depths [2,2,2,2] with window
attention (window 7 in the reference, configurable here so it divides the
feature size), patch-merging downsampling, symmetric decoder with
patch-expanding upsampling and skip concatenation, 4x final expand + 1x1
head. Full reference config surface (:618-633): qkv_bias / qk_scale,
drop_rate / attn_drop_rate, stochastic depth (drop_path_rate 0.1, linearly
scaled over encoder blocks, decoder mirrors the encoder slices), absolute
position embedding (ape), patch_norm, depths_decoder.

Skip taps match the reference dataflow: forward_features records each
encoder BasicLayer's INPUT (x_downsample.append before layer(x), :755-760),
so decoder stage s concatenates the post-merge tensor entering encoder
stage s.

Reference quirk (documented, not replicated blindly): the reference accepts
depths_decoder=[1,2,2,2] but its BasicLayer_up constructors use `depths`
(:697-700), so decoder depths actually equal encoder depths. Here
depths_decoder=None reproduces that effective behavior; passing an explicit
tuple makes the knob functional (depths_decoder[i] is the depth of decoder
layer i, i.e. stage 3-i, matching the reference's layers_up indexing).

ImageNet-pretrained weights can be ingested from a local checkpoint via
arco_tpu.compat.torch_import (zero-egress environment: no auto-download).
"""

from __future__ import annotations

from typing import Optional, Sequence

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


class DropPath(nn.Module):
    """Stochastic depth: drop the whole residual branch per sample
    (timm drop_path semantics used at swin...decoder_sys.py:147)."""
    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        bw, n, c = x.shape
        ws = self.window_size
        head_dim = self.dim // self.num_heads
        scale = self.qk_scale if self.qk_scale is not None \
            else head_dim ** -0.5
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias,
                       dtype=self.dtype)(x)
        qkv = qkv.reshape(bw, n, 3, self.num_heads, head_dim)
        q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
        attn = (q @ k.transpose(0, 1, 3, 2)) * scale

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
        attn = nn.Dropout(self.attn_drop,
                          deterministic=deterministic)(attn)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(bw, n, c)
        out = nn.Dense(self.dim, dtype=self.dtype)(out)
        return nn.Dropout(self.proj_drop, deterministic=deterministic)(out)


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
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
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
                               qkv_bias=self.qkv_bias,
                               qk_scale=self.qk_scale,
                               attn_drop=self.attn_drop,
                               proj_drop=self.drop,
                               dtype=self.dtype)(windows, mask,
                                                 deterministic)
        x = window_reverse(attn, ws, hp, wp)
        if shift:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        if ph or pw:
            x = x[:, :h, :w]
        x = shortcut + DropPath(self.drop_path)(x, deterministic)
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dropout(self.drop, deterministic=deterministic)(y)
        y = nn.Dense(self.dim, dtype=self.dtype)(y)
        y = nn.Dropout(self.drop, deterministic=deterministic)(y)
        return x + DropPath(self.drop_path)(y, deterministic)


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
    """SwinTransformerSys parity; returns the ARCO contract
    (logits, bottleneck latent, encoder skip list)."""
    img_size: int = 224
    num_classes: int = 4
    in_chns: int = 1
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 2, 2)
    depths_decoder: Optional[Sequence[int]] = None
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    ape: bool = False
    patch_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        det = not train
        n_stages = len(self.depths)
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        # patch embed 4x4 (+ optional norm, :651-653 patch_norm)
        h = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4),
                    dtype=self.dtype)(x)
        if self.patch_norm:
            h = nn.LayerNorm(dtype=self.dtype)(h)
        if self.ape:  # absolute position embedding (:656-660)
            pos = self.param("absolute_pos_embed",
                             nn.initializers.normal(0.02),
                             (1, h.shape[1], h.shape[2], self.embed_dim))
            h = h + pos.astype(self.dtype)
        h = nn.Dropout(self.drop_rate, deterministic=det)(h)

        # stochastic depth decay rule: linearly scaled over encoder blocks
        # (:663-665); decoder mirrors the encoder's per-stage slices
        total = sum(self.depths)
        dpr = [float(r) for r in np.linspace(0, self.drop_path_rate,
                                             total)] if total > 1 else [0.0]
        stage_dpr = [dpr[sum(self.depths[:i]):sum(self.depths[:i + 1])]
                     for i in range(n_stages)]

        def blocks(h, dim, stage, depth, det):
            for blk in range(depth):
                rates = stage_dpr[stage]
                h = SwinBlock(dim, self.num_heads[stage], self.window_size,
                              shift=0 if blk % 2 == 0 else
                              self.window_size // 2,
                              mlp_ratio=self.mlp_ratio,
                              qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                              drop=self.drop_rate,
                              attn_drop=self.attn_drop_rate,
                              drop_path=rates[min(blk, len(rates) - 1)],
                              dtype=self.dtype)(h, det)
            return h

        # encoder: skip = each stage's INPUT (forward_features :755-760)
        skips = []
        dim = self.embed_dim
        for stage, depth in enumerate(self.depths):
            skips.append(h)
            h = blocks(h, dim, stage, depth, det)
            if stage < n_stages - 1:
                h = PatchMerging(dim, self.dtype)(h)
                dim *= 2
        h = nn.LayerNorm(dtype=self.dtype)(h)  # self.norm (:716)
        latent = h

        # decoder: expand + skip concat + reduce + blocks
        # (forward_up_features :763-773); decoder depth for stage s =
        # depths_decoder[n-1-s] when given, else encoder depths[s]
        # (the reference's effective behavior, :697-700)
        for stage in range(n_stages - 2, -1, -1):
            h = PatchExpand(dim, 2, self.dtype)(h)
            dim //= 2
            h = jnp.concatenate([h, skips[stage]], axis=-1)
            h = nn.Dense(dim, dtype=self.dtype)(h)  # concat_back_dim
            d = (self.depths_decoder[n_stages - 1 - stage]
                 if self.depths_decoder is not None else self.depths[stage])
            h = blocks(h, dim, stage, d, det)
        h = nn.LayerNorm(dtype=self.dtype)(h)  # self.norm_up (:717)

        # final 4x expand + head (FinalPatchExpand_X4, up_x4 :776-786)
        b, hh, ww, c = h.shape
        h = nn.Dense(16 * c, use_bias=False, dtype=self.dtype)(h)
        h = h.reshape(b, hh, ww, 4, 4, c)
        h = h.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh * 4, ww * 4, c)
        h = nn.LayerNorm(dtype=self.dtype)(h)
        logits = nn.Conv(self.num_classes, (1, 1), use_bias=False,
                         dtype=self.dtype)(h)
        return logits, latent, skips
