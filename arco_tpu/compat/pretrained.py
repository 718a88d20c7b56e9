"""Local-file pretrained-weight importers for the transformer/CNN zoo.

The reference loads ImageNet weights for TransUNet
(vit_seg_modeling.py:400-457 `load_from`, ViT-B_16.npz), Swin-UNet
(vision_transformer.py:50-89 `load_from`, swin .pth with encoder->decoder
mirroring), and EfficientUNet (efficient_encoder.py url table,
lukemelas-format .pth). This environment has zero egress, so nothing is
auto-downloaded — these converters ingest a user-provided local checkpoint
file into flax param trees for the corresponding arco_tpu models.

Layout conversions:
- ViT .npz is flax-native (HWIO convs, [H, nh, hd] attention kernels):
  keys are remapped, the position-embedding grid is resized and its class
  token dropped exactly as the reference does (vit_seg_modeling.py:406-428).
- Swin .pth is torch: Linear [out, in] -> kernel [in, out] transpose;
  PatchMerging's 4C concat order differs (torch x0x1x2x3 = h0w0,h1w0,h0w1,
  h1w1 vs our reshape order h0w0,h0w1,h1w0,h1w1) -> channel-block
  permutation [0,2,1,3]; relative-position bias tables are bilinearly
  resized when the window size differs; encoder layers are mirrored into
  the decoder (vision_transformer.py:74-79: layers.i -> layers_up.3-i).
- EfficientNet .pth (lukemelas): _blocks.{i} flattened ordering matches the
  flax MBConv_{i} counter; conv OIHW -> HWIO, depthwise [C,1,k,k] ->
  HWIO [k, k, 1, C].
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def _np(v):
    return v.cpu().numpy() if hasattr(v, "cpu") else np.asarray(v)


def deep_merge(target: Dict, updates: Dict) -> Dict:
    """Return a copy of ``target`` with ``updates`` merged in (leaves in
    updates replace leaves in target; missing branches raise so silent
    key-mismatch bugs can't slip through)."""
    out = dict(target)
    for k, v in updates.items():
        if k not in out:
            raise KeyError(f"pretrained key {k!r} not in target tree "
                           f"(have {sorted(out)[:8]}...)")
        if isinstance(v, dict):
            out[k] = deep_merge(out[k], v)
        else:
            if tuple(np.shape(out[k])) != tuple(np.shape(v)):
                raise ValueError(
                    f"shape mismatch for {k!r}: target "
                    f"{np.shape(out[k])} vs pretrained {np.shape(v)}")
            out[k] = v
    return out


def _to_jnp(t):
    import jax.numpy as jnp
    return {k: _to_jnp(v) if isinstance(v, dict) else jnp.asarray(v)
            for k, v in t.items()}


# --------------------------------------------------------------------------
# TransUNet: ViT .npz (R50+ViT-B_16)
# --------------------------------------------------------------------------

def _resize_posembed(posemb: np.ndarray, n_tokens: int) -> np.ndarray:
    """Drop the class token and bilinearly resize the grid
    (vit_seg_modeling.py:406-428)."""
    posemb = np.asarray(posemb)
    if posemb.shape[1] == n_tokens:
        return posemb
    if posemb.shape[1] - 1 == n_tokens:
        return posemb[:, 1:]
    grid = posemb[0, 1:] if posemb.shape[1] % 2 else posemb[0]
    gs_old = int(np.sqrt(grid.shape[0]))
    gs_new = int(np.sqrt(n_tokens))
    from scipy import ndimage
    grid = grid.reshape(gs_old, gs_old, -1)
    zoom = (gs_new / gs_old, gs_new / gs_old, 1)
    grid = ndimage.zoom(grid, zoom, order=1)
    return grid.reshape(1, gs_new * gs_new, -1)


def convert_vit_npz(weights: Dict, n_tokens: int,
                    num_layers: int = 12,
                    resnet_units: Sequence[int] = (3, 4, 9)) -> Dict:
    """ViT-B_16 (R50 hybrid) .npz -> partial params tree for
    arco_tpu.models.transunet.VisionTransformerSeg.

    Covers the hybrid ResNet stem, patch embedding, position embedding,
    the 12 transformer blocks, and the final encoder norm — exactly the
    subset the reference's load_from restores; decoder/head stay at init.
    """
    w = {k: np.asarray(v) for k, v in weights.items()}
    p: Dict = {}

    # hybrid ResNet stem (vit_seg_modeling_resnet_skip.py:76-110)
    stem: Dict = {"StdConv_0": {"kernel": w["conv_root/kernel"]},
                  "GroupNorm_0": {"scale": w["gn_root/scale"].reshape(-1),
                                  "bias": w["gn_root/bias"].reshape(-1)}}
    unit_idx = 0
    for stage, n_units in enumerate(resnet_units):
        for u in range(1, n_units + 1):
            pre = f"block{stage + 1}/unit{u}/"
            has_proj = u == 1
            unit: Dict = {}
            # call order: [proj conv+gn first], then conv1..3 with gn1..3
            off = 1 if has_proj else 0
            if has_proj:
                unit["StdConv_0"] = {"kernel": w[pre + "conv_proj/kernel"]}
                unit["GroupNorm_0"] = {
                    "scale": w[pre + "gn_proj/scale"].reshape(-1),
                    "bias": w[pre + "gn_proj/bias"].reshape(-1)}
            for c in range(1, 4):
                unit[f"StdConv_{c - 1 + off}"] = {
                    "kernel": w[pre + f"conv{c}/kernel"]}
                unit[f"GroupNorm_{c - 1 + off}"] = {
                    "scale": w[pre + f"gn{c}/scale"].reshape(-1),
                    "bias": w[pre + f"gn{c}/bias"].reshape(-1)}
            stem[f"PreActBottleneck_{unit_idx}"] = unit
            unit_idx += 1
    p["ResNetV2Stem_0"] = stem

    # patch embedding (1x1 conv over the 1/16 hybrid features)
    p["Conv_0"] = {"kernel": w["embedding/kernel"],
                   "bias": w["embedding/bias"]}
    p["pos_embedding"] = _resize_posembed(
        w["Transformer/posembed_input/pos_embedding"], n_tokens)

    for i in range(num_layers):
        pre = f"Transformer/encoderblock_{i}/"
        att = "MultiHeadDotProductAttention_1/"
        p[f"TransformerBlock_{i}"] = {
            "LayerNorm_0": {"scale": w[pre + "LayerNorm_0/scale"],
                            "bias": w[pre + "LayerNorm_0/bias"]},
            "MultiHeadDotProductAttention_0": {
                name: {"kernel": w[pre + att + f"{name}/kernel"],
                       "bias": w[pre + att + f"{name}/bias"]}
                for name in ("query", "key", "value", "out")},
            "LayerNorm_1": {"scale": w[pre + "LayerNorm_2/scale"],
                            "bias": w[pre + "LayerNorm_2/bias"]},
            "Dense_0": {"kernel": w[pre + "MlpBlock_3/Dense_0/kernel"],
                        "bias": w[pre + "MlpBlock_3/Dense_0/bias"]},
            "Dense_1": {"kernel": w[pre + "MlpBlock_3/Dense_1/kernel"],
                        "bias": w[pre + "MlpBlock_3/Dense_1/bias"]},
        }
    p["LayerNorm_0"] = {"scale": w["Transformer/encoder_norm/scale"],
                        "bias": w["Transformer/encoder_norm/bias"]}
    return _to_jnp(p)


# --------------------------------------------------------------------------
# Swin-UNet: ImageNet Swin .pth
# --------------------------------------------------------------------------

# our PatchMerging flattens (h_off, w_off) row-major = [x0, x2, x1, x3] in
# torch's [x0, x1, x2, x3] = [h0w0, h1w0, h0w1, h1w1] numbering
_MERGE_PERM = (0, 2, 1, 3)


def _perm4c(v: np.ndarray, axis: int = 0) -> np.ndarray:
    c = v.shape[axis] // 4
    chunks = np.split(v, 4, axis=axis)
    return np.concatenate([chunks[i] for i in _MERGE_PERM], axis=axis)


def _resize_bias_table(table: np.ndarray, ws_new: int) -> np.ndarray:
    side_old = int(np.sqrt(table.shape[0]))
    side_new = 2 * ws_new - 1
    if side_old == side_new:
        return table
    from scipy import ndimage
    t = table.reshape(side_old, side_old, -1)
    t = ndimage.zoom(t, (side_new / side_old, side_new / side_old, 1),
                     order=1)
    return t.reshape(side_new * side_new, -1)


def _swin_block(sd: Dict, pre: str, ws: int) -> Dict:
    lin = lambda k: {"kernel": _np(sd[f"{pre}{k}.weight"]).T,
                     "bias": _np(sd[f"{pre}{k}.bias"])}
    return {
        "LayerNorm_0": {"scale": _np(sd[f"{pre}norm1.weight"]),
                        "bias": _np(sd[f"{pre}norm1.bias"])},
        "WindowAttention_0": {
            "Dense_0": lin("attn.qkv"),
            "Dense_1": lin("attn.proj"),
            "relative_position_bias_table": _resize_bias_table(
                _np(sd[f"{pre}attn.relative_position_bias_table"]), ws),
        },
        "LayerNorm_1": {"scale": _np(sd[f"{pre}norm2.weight"]),
                        "bias": _np(sd[f"{pre}norm2.bias"])},
        "Dense_0": lin("mlp.fc1"),
        "Dense_1": lin("mlp.fc2"),
    }


def convert_swin_state_dict(sd: Dict, depths: Sequence[int] = (2, 2, 2, 2),
                            depths_decoder: Optional[Sequence[int]] = None,
                            window_size: int = 8, img_size: int = 224,
                            ape: bool = False) -> Dict:
    """ImageNet Swin encoder .pth ({'model': state_dict} or flat) ->
    partial params for arco_tpu.models.swin_unet.SwinUnet, with the
    reference's encoder->decoder mirroring (vision_transformer.py:74-79:
    decoder stage s reuses encoder layer s block weights).

    ``img_size`` sets the per-stage EFFECTIVE window (SwinBlock clamps
    ws = min(window_size, stage resolution)), which sizes the
    relative-position bias tables to resize into."""
    sd = sd.get("model", sd)
    n = len(depths)
    # stage s runs at resolution img/4/2^s; bias tables must match the
    # clamped window actually used there
    stage_ws = [min(window_size, max(1, img_size // 4 // (2 ** s)))
                for s in range(n)]
    p: Dict = {"Conv_0": {
        "kernel": _np(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
        "bias": _np(sd["patch_embed.proj.bias"])}}
    if "patch_embed.norm.weight" in sd:
        p["LayerNorm_0"] = {"scale": _np(sd["patch_embed.norm.weight"]),
                            "bias": _np(sd["patch_embed.norm.bias"])}
    if ape and "absolute_pos_embed" in sd:
        emb = _np(sd["absolute_pos_embed"])  # [1, L, C]
        side = int(np.sqrt(emb.shape[1]))
        p["absolute_pos_embed"] = emb.reshape(1, side, side, -1)

    # encoder blocks: global SwinBlock counter over stages, then merging
    blk = 0
    for stage, depth in enumerate(depths):
        for j in range(depth):
            key = f"layers.{stage}.blocks.{j}."
            if f"{key}norm1.weight" in sd:
                p[f"SwinBlock_{blk}"] = _swin_block(sd, key,
                                                    stage_ws[stage])
            blk += 1
        if stage < n - 1 and f"layers.{stage}.downsample.norm.weight" in sd:
            p[f"PatchMerging_{stage}"] = {
                "LayerNorm_0": {
                    "scale": _perm4c(
                        _np(sd[f"layers.{stage}.downsample.norm.weight"])),
                    "bias": _perm4c(
                        _np(sd[f"layers.{stage}.downsample.norm.bias"]))},
                "Dense_0": {"kernel": _perm4c(
                    _np(sd[f"layers.{stage}.downsample.reduction.weight"]).T,
                    axis=0)},
            }
    if "norm.weight" in sd:
        p["LayerNorm_1"] = {"scale": _np(sd["norm.weight"]),
                            "bias": _np(sd["norm.bias"])}

    # decoder mirror: stage order (n-2 .. 0), depth from depths_decoder
    # mapping or encoder depths (see SwinUnet docstring)
    for stage in range(n - 2, -1, -1):
        d = (depths_decoder[n - 1 - stage]
             if depths_decoder is not None else depths[stage])
        for j in range(d):
            key = f"layers.{stage}.blocks.{j}."
            if f"{key}norm1.weight" in sd:
                p[f"SwinBlock_{blk}"] = _swin_block(sd, key,
                                                    stage_ws[stage])
            blk += 1
    return _to_jnp(p)


# --------------------------------------------------------------------------
# EfficientUNet: lukemelas EfficientNet .pth
# --------------------------------------------------------------------------

def _torch_conv(sd, key, depthwise=False):
    w = _np(sd[f"{key}.weight"])
    if depthwise:  # [C, 1, kh, kw] -> [kh, kw, 1, C]
        kernel = w.transpose(2, 3, 1, 0)
    else:          # OIHW -> HWIO
        kernel = w.transpose(2, 3, 1, 0)
    out = {"kernel": kernel}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _torch_bn(sd, key):
    return ({"scale": _np(sd[f"{key}.weight"]),
             "bias": _np(sd[f"{key}.bias"])},
            {"mean": _np(sd[f"{key}.running_mean"]),
             "var": _np(sd[f"{key}.running_var"])})


def convert_efficientnet_state_dict(
        sd: Dict, width: float = 1.2, depth: float = 1.4,
        in_chns: int = 3
) -> Tuple[Dict, Dict]:
    """lukemelas EfficientNet(-B3) .pth -> (params, batch_stats) partial
    trees for the EfficientNetEncoder_0 scope of
    arco_tpu.models.efficientunet.EffiUNet. The classifier head
    (_conv_head/_fc) has no counterpart and is skipped. For grayscale
    models (in_chns=1) the RGB stem kernel is summed over the input
    channel — the standard segmentation-encoder adaptation that preserves
    the response to replicated-gray inputs."""
    from arco_tpu.models.efficientunet import (B0_BLOCKS, _round_filters,
                                               _round_repeats)
    p: Dict = {}
    s: Dict = {}
    bn_p, bn_s = _torch_bn(sd, "_bn0")
    stem_conv = _torch_conv(sd, "_conv_stem")
    if in_chns != stem_conv["kernel"].shape[2]:
        if in_chns == 1:
            stem_conv["kernel"] = stem_conv["kernel"].sum(
                axis=2, keepdims=True)
        else:
            raise ValueError(
                f"cannot adapt stem from "
                f"{stem_conv['kernel'].shape[2]} to {in_chns} channels")
    p["Conv_0"] = stem_conv
    p["BatchNorm_0"], s["BatchNorm_0"] = bn_p, bn_s

    i = 0
    for (e, c, r, st, k) in B0_BLOCKS:
        for j in range(_round_repeats(r, depth)):
            pre = f"_blocks.{i}"
            mb_p: Dict = {}
            mb_s: Dict = {}
            ci = 0
            if e != 1:
                bp, bs = _torch_bn(sd, f"{pre}._bn0")
                mb_p[f"Conv_{ci}"] = _torch_conv(sd, f"{pre}._expand_conv")
                mb_p[f"BatchNorm_{ci}"], mb_s[f"BatchNorm_{ci}"] = bp, bs
                ci += 1
            bp, bs = _torch_bn(sd, f"{pre}._bn1")
            mb_p[f"Conv_{ci}"] = _torch_conv(sd, f"{pre}._depthwise_conv",
                                             depthwise=True)
            mb_p[f"BatchNorm_{ci}"], mb_s[f"BatchNorm_{ci}"] = bp, bs
            ci += 1
            mb_p["SqueezeExcite_0"] = {
                "Conv_0": _torch_conv(sd, f"{pre}._se_reduce"),
                "Conv_1": _torch_conv(sd, f"{pre}._se_expand")}
            bp, bs = _torch_bn(sd, f"{pre}._bn2")
            mb_p[f"Conv_{ci}"] = _torch_conv(sd, f"{pre}._project_conv")
            mb_p[f"BatchNorm_{ci}"], mb_s[f"BatchNorm_{ci}"] = bp, bs
            p[f"MBConv_{i}"] = mb_p
            s[f"MBConv_{i}"] = mb_s
            i += 1
    return _to_jnp(p), _to_jnp(s)


# --------------------------------------------------------------------------
# top-level loader
# --------------------------------------------------------------------------

def load_pretrained(model: str, path: str, params: Dict,
                    batch_stats: Optional[Dict] = None, **kw):
    """Merge a local pretrained checkpoint file into an initialized
    (params, batch_stats) pair. ``model`` in {'vit_seg', 'swin_unet',
    'efficient_unet'} (factory key 'ViT_Seg' accepted); extra kwargs
    forwarded to the converter."""
    model = model.lower()
    if model == "vit_seg":
        w = dict(np.load(path))
        n_tokens = int(np.shape(params["pos_embedding"])[1])
        sub = convert_vit_npz(w, n_tokens, **kw)
        return deep_merge(params, sub), batch_stats
    if model == "swin_unet":
        import torch
        sd = torch.load(path, map_location="cpu")
        sub = convert_swin_state_dict(sd, **kw)
        return deep_merge(params, sub), batch_stats
    if model == "efficient_unet":
        import torch
        sd = torch.load(path, map_location="cpu")
        sd = sd.get("state_dict", sd)
        kw.setdefault("in_chns", int(np.shape(
            params["EfficientNetEncoder_0"]["Conv_0"]["kernel"])[2]))
        pp, ss = convert_efficientnet_state_dict(sd, **kw)
        params = deep_merge(params,
                            {"EfficientNetEncoder_0": pp})
        if batch_stats is not None:
            batch_stats = deep_merge(batch_stats,
                                     {"EfficientNetEncoder_0": ss})
        return params, batch_stats
    raise ValueError(f"no pretrained importer for model {model!r}")
