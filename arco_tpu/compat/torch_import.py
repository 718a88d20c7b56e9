"""Import reference PyTorch checkpoints into arco_tpu.

Users of the reference hold ``iter_<N>.pth`` U-Net state_dicts
(train_arco_2d.py:462-470); this module converts them to flax
(params, batch_stats) for the arco_tpu UNet so training/eval can continue
here without retraining stage 1.

Weight layout conversions (validated to 0 ulp against torch ops):
- Conv2d      [O, I, kh, kw]  -> HWIO [kh, kw, I, O]
- ConvTranspose2d [I, O, kh, kw] -> flipped HWIO
  ``w.transpose(2, 3, 0, 1)[::-1, ::-1]`` (lax.conv_transpose places an
  unflipped kernel; torch's transposed conv is gradient-of-conv)
- BatchNorm2d weight/bias/running_mean/running_var ->
  scale/bias + batch_stats mean/var

Reference module layout (networks/unetWithArgs.py):
  encoder.in_conv.conv_conv.{0 conv,1 bn,4 conv,5 bn}
  encoder.down{k}.maxpool_conv.1.conv_conv.{0,1,4,5}
  decoder.up{k}.up (ConvTranspose2d), decoder.up{k}.conv.conv_conv.{...}
  decoder.out_conv
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv(sd, prefix):
    w = np.asarray(sd[f"{prefix}.weight"])
    out = {"kernel": w.transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _convT(sd, prefix):
    w = np.asarray(sd[f"{prefix}.weight"])
    kernel = w.transpose(2, 3, 0, 1)[::-1, ::-1].copy()
    out = {"kernel": kernel}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _bn(sd, prefix):
    params = {"scale": np.asarray(sd[f"{prefix}.weight"]),
              "bias": np.asarray(sd[f"{prefix}.bias"])}
    stats = {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
             "var": np.asarray(sd[f"{prefix}.running_var"])}
    return params, stats


def _conv_block(sd, prefix):
    """conv_conv.{0 conv,1 bn,4 conv,5 bn} -> ConvBlock2D tree."""
    params, stats = {}, {}
    for j, idx in enumerate((0, 4)):
        bn_p, bn_s = _bn(sd, f"{prefix}.conv_conv.{idx + 1}")
        params[f"ConvBNAct_{j}"] = {
            "Conv_0": _conv(sd, f"{prefix}.conv_conv.{idx}"),
            "BatchNorm_0": bn_p}
        stats[f"ConvBNAct_{j}"] = {"BatchNorm_0": bn_s}
    return params, stats


def convert_unet_state_dict(sd: Dict) -> Tuple[Dict, Dict]:
    """Reference UNet state_dict -> (params, batch_stats) for
    arco_tpu.models.unet2d.UNet."""
    sd = {k: v.cpu().numpy() if hasattr(v, "cpu") else np.asarray(v)
          for k, v in sd.items()}
    enc_p, enc_s = {}, {}
    p, s = _conv_block(sd, "encoder.in_conv")
    enc_p["ConvBlock2D_0"], enc_s["ConvBlock2D_0"] = p, s
    for k in range(1, 5):
        p, s = _conv_block(sd, f"encoder.down{k}.maxpool_conv.1")
        enc_p[f"ConvBlock2D_{k}"], enc_s[f"ConvBlock2D_{k}"] = p, s

    dec_p, dec_s = {}, {}
    for k in range(1, 5):
        # UpBlock's actual path is conv1x1 + bilinear upsample
        # (unetWithArgs.py:71-76; bilinear=False is never wired through)
        dec_p[f"BilinearUp_{k - 1}"] = {
            "Conv_0": _conv(sd, f"decoder.up{k}.conv1x1")}
        p, s = _conv_block(sd, f"decoder.up{k}.conv")
        dec_p[f"ConvBlock2D_{k - 1}"], dec_s[f"ConvBlock2D_{k - 1}"] = p, s
    dec_p["Conv_0"] = _conv(sd, "decoder.out_conv")

    params = {"Encoder_0": enc_p, "Decoder_0": dec_p}
    batch_stats = {"Encoder_0": enc_s, "Decoder_0": dec_s}
    import jax.numpy as jnp
    to_jnp = lambda t: {k: to_jnp(v) if isinstance(v, dict)
                        else jnp.asarray(v) for k, v in t.items()}
    return to_jnp(params), to_jnp(batch_stats)


def _conv3d(sd, prefix):
    w = np.asarray(sd[f"{prefix}.weight"])        # [O, I, kd, kh, kw]
    out = {"kernel": w.transpose(2, 3, 4, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _convT3d(sd, prefix):
    w = np.asarray(sd[f"{prefix}.weight"])        # [I, O, kd, kh, kw]
    kernel = w.transpose(2, 3, 4, 0, 1)[::-1, ::-1, ::-1].copy()
    out = {"kernel": kernel}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _vnet_conv_block(sd, prefix, n_stages):
    """ConvBlock: per stage [Conv3d, BN, ReLU] -> conv.{3i}, conv.{3i+1}
    (vnetWithArgs.py:5-31)."""
    params, stats = {}, {}
    for i in range(n_stages):
        bn_p, bn_s = _bn(sd, f"{prefix}.conv.{3 * i + 1}")
        params[f"ConvBNAct_{i}"] = {
            "Conv_0": _conv3d(sd, f"{prefix}.conv.{3 * i}"),
            "BatchNorm_0": bn_p}
        stats[f"ConvBNAct_{i}"] = {"BatchNorm_0": bn_s}
    return params, stats


def convert_vnet_state_dict(sd: Dict) -> Tuple[Dict, Dict]:
    """Reference VNet state_dict (vnetWithArgs.py:145-241, batchnorm config)
    -> (params, batch_stats) for arco_tpu.models.vnet3d.VNet."""
    sd = {k: v.cpu().numpy() if hasattr(v, "cpu") else np.asarray(v)
          for k, v in sd.items()}
    params, stats = {}, {}

    conv_blocks = [("block_one", 1), ("block_two", 2), ("block_three", 3),
                   ("block_four", 3), ("block_five", 3), ("block_six", 3),
                   ("block_seven", 3), ("block_eight", 2), ("block_nine", 1)]
    for i, (name, n) in enumerate(conv_blocks):
        p, s = _vnet_conv_block(sd, name, n)
        params[f"VNetConvBlock_{i}"], stats[f"VNetConvBlock_{i}"] = p, s

    for i, name in enumerate(("block_one_dw", "block_two_dw",
                              "block_three_dw", "block_four_dw")):
        bn_p, bn_s = _bn(sd, f"{name}.conv.1")
        params[f"DownBlock_{i}"] = {"Conv_0": _conv3d(sd, f"{name}.conv.0"),
                                    "BatchNorm_0": bn_p}
        stats[f"DownBlock_{i}"] = {"BatchNorm_0": bn_s}

    for i, name in enumerate(("block_five_up", "block_six_up",
                              "block_seven_up", "block_eight_up")):
        bn_p, bn_s = _bn(sd, f"{name}.conv.1")
        params[f"UpBlock_{i}"] = {
            "ConvTransposeUp_0": {
                "ConvTranspose_0": _convT3d(sd, f"{name}.conv.0")},
            "BatchNorm_0": bn_p}
        stats[f"UpBlock_{i}"] = {"BatchNorm_0": bn_s}

    params["Conv_0"] = _conv3d(sd, "out_conv")

    import jax.numpy as jnp
    to_jnp = lambda t: {k: to_jnp(v) if isinstance(v, dict)
                        else jnp.asarray(v) for k, v in t.items()}
    return to_jnp(params), to_jnp(stats)


def _np_sd(sd: Dict) -> Dict:
    return {k: v.cpu().numpy() if hasattr(v, "cpu") else np.asarray(v)
            for k, v in sd.items()}


def _nd_conv_kernel(w):
    """torch ConvNd weight [O, I, *k] -> flax [*k, I, O], any rank."""
    import jax.numpy as jnp
    w = np.asarray(w)
    nd = w.ndim - 2
    return jnp.asarray(w.transpose(tuple(range(2, 2 + nd)) + (1, 0)))


def _dense(sd, prefix):
    """torch Linear [O, I] (+bias) -> flax Dense {kernel [I, O], bias}."""
    import jax.numpy as jnp
    return {"kernel": jnp.asarray(np.asarray(sd[f"{prefix}.weight"]).T),
            "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"]))}


def convert_feature_extractor_state_dict(sd: Dict) -> Dict:
    """Reference FeatureExtractor / FeatureExtractor_3d (model_2D.py:20-56,
    model_3D.py:20-63: five bias-free 1x1 ConvNd 'fea0'..'fea4') -> params
    for arco_tpu.models.heads.FeatureExtractor (same tree: fea{i}/kernel).
    Rank-generic: the kernel transpose adapts to Conv2d/Conv3d weights."""
    sd = _np_sd(sd)
    return {f"fea{i}": {"kernel": _nd_conv_kernel(sd[f"fea{i}.weight"])}
            for i in range(5)}


def convert_q_representation_state_dict(sd: Dict) -> Dict:
    """Reference q_representation (train_arco_2d.py:231-235 /
    train_arco_3d.py:208-211: Sequential of two bias-free 1x1 ConvNd) ->
    params for heads.QRepresentation."""
    sd = _np_sd(sd)
    return {f"Conv_{i}": {"kernel": _nd_conv_kernel(sd[f"{i}.weight"])}
            for i in range(2)}


def convert_latent_mlp_state_dict(sd: Dict, pooling_size: int = 1) -> Dict:
    """Reference MLP / MLP_3d (model_2D.py:98-112, model_3D.py:202-216:
    AdaptiveAvgPool(pooling) + f1/f2 Linear) -> params for heads.LatentMLP.

    Only pooling_size=1 flattens identically on both sides (torch flattens
    channel-major, flax channels-last spatial-major); the published recipes
    all use latent_pooling_size=1 (train_arco_2d.py:62)."""
    assert pooling_size == 1, "flatten order differs for pooling_size > 1"
    sd = _np_sd(sd)
    return {"Dense_0": _dense(sd, "f1"), "Dense_1": _dense(sd, "f2")}


def convert_latent_predictor_state_dict(sd: Dict) -> Dict:
    """Reference latent_predictor (model_2D.py:146-151: Sequential of two
    Linear) -> params for heads.LatentPredictor."""
    sd = _np_sd(sd)
    return {"Dense_0": _dense(sd, "0"), "Dense_1": _dense(sd, "1")}


def convert_projection_head_state_dict(sd: Dict) -> Dict:
    """Reference ProjectionHead / ProjectionHead_3d convmlp
    (model_2D.py:67-92, model_3D.py:143-161: AdaptiveAvgPool + ConvNd
    dim_in->2*dim_in + ConvNd 2*dim_in->proj_dim, keys proj.1/proj.2) ->
    params for heads.ProjectionHead."""
    import jax.numpy as jnp
    sd = _np_sd(sd)
    out = {}
    for j, key in enumerate(("proj.1", "proj.2")):
        out[f"Conv_{j}"] = {
            "kernel": _nd_conv_kernel(sd[f"{key}.weight"]),
            "bias": jnp.asarray(np.asarray(sd[f"{key}.bias"]))}
    return out


def convert_outputs_predictor_state_dict(sd: Dict) -> Dict:
    """Reference outputs_predictor (model_2D.py:157-160 / model_3D.py:250-253:
    Sequential of two 1x1 ConvNd with bias) -> params for
    heads.OutputsPredictor."""
    import jax.numpy as jnp
    sd = _np_sd(sd)
    return {f"Conv_{i}": {
        "kernel": _nd_conv_kernel(sd[f"{i}.weight"]),
        "bias": jnp.asarray(np.asarray(sd[f"{i}.bias"]))}
        for i in range(2)}


def convert_deeplab_state_dict(sd: Dict, layers=(3, 4, 6, 3)) -> Tuple[
        Dict, Dict]:
    """Reference caffe-style DeepLab-v2 ResNet (models/deeplab.py:148-260:
    conv1/bn1, layer{1..4}.{b}.conv{1..3}+bn{1..3}(+downsample.0/.1),
    layer5.conv2d_list.{0..3}) -> (params, batch_stats) for
    arco_tpu.models.deeplab.DeepLabV2.

    Mirrors model_factory.py:55-60's partial-copy semantics: missing keys
    (e.g. layer5 absent from the caffe trunk checkpoints, or a classifier
    with a different class count) are simply skipped — merge the result
    over freshly-initialized params with ``merge_params``.
    """
    sd = _np_sd(sd)
    params, stats = {}, {}
    bb_p, bb_s = {}, {}

    def put_bn(dst_p, dst_s, flax_name, prefix):
        if f"{prefix}.weight" not in sd:
            return False
        p, s = _bn(sd, prefix)
        dst_p[flax_name] = p
        dst_s[flax_name] = s
        return True

    if "conv1.weight" in sd:
        bb_p["Conv_0"] = _conv(sd, "conv1")
    put_bn(bb_p, bb_s, "BatchNorm_0", "bn1")

    block_idx = 0
    for li, blocks in enumerate(layers, start=1):
        for b in range(blocks):
            pre = f"layer{li}.{b}"
            if f"{pre}.conv1.weight" not in sd:
                block_idx += 1
                continue
            bp, bs = {}, {}
            for j in range(3):
                bp[f"Conv_{j}"] = _conv(sd, f"{pre}.conv{j + 1}")
                put_bn(bp, bs, f"BatchNorm_{j}", f"{pre}.bn{j + 1}")
            if f"{pre}.downsample.0.weight" in sd:
                bp["Conv_3"] = _conv(sd, f"{pre}.downsample.0")
                put_bn(bp, bs, "BatchNorm_3", f"{pre}.downsample.1")
            bb_p[f"Bottleneck_{block_idx}"] = bp
            bb_s[f"Bottleneck_{block_idx}"] = bs
            block_idx += 1
    params["ResNetBackbone_0"] = bb_p
    stats["ResNetBackbone_0"] = bb_s

    cls = {}
    for j in range(4):
        if f"layer5.conv2d_list.{j}.weight" in sd:
            cls[f"Conv_{j}"] = _conv(sd, f"layer5.conv2d_list.{j}")
    if cls:
        params["ClassifierModule_0"] = cls

    import jax.numpy as jnp
    to_jnp = lambda t: {k: to_jnp(v) if isinstance(v, dict)
                        else jnp.asarray(v) for k, v in t.items()}
    return to_jnp(params), to_jnp(stats)


def convert_deeplab_2branch_state_dict(sd: Dict,
                                       layers=(3, 4, 23, 3)) -> Tuple[
        Dict, Dict]:
    """Reference DeepLab_2branch (models/deeplab_2branch.py:151-218) ->
    (params, batch_stats) for arco_tpu.models.deeplab.DeepLab2Branch.

    The 2branch torch tree names its modules identically to the v2 trunk
    (conv1/bn1, layer{1..4}, layer5.conv2d_list.{0..3}) — only the forward
    differs (channel-split + 1024-input classifier), so the layout reuses
    convert_deeplab_state_dict verbatim; the Flax module field names
    (ResNetBackbone_0 / ClassifierModule_0) are shared by construction."""
    return convert_deeplab_state_dict(sd, layers=layers)


def merge_params(init: Dict, imported: Dict) -> Dict:
    """Recursively overlay ``imported`` onto ``init`` where leaf SHAPES
    match — the reference's caffe-like partial copy
    (model_factory.py:55-60)."""
    out = {}
    for k, v in init.items():
        if k not in imported:
            out[k] = v
        elif isinstance(v, dict):
            out[k] = merge_params(v, imported[k])
        else:
            imp = imported[k]
            out[k] = imp if tuple(imp.shape) == tuple(v.shape) else v
    return out


def load_reference_checkpoint(path: str, model: str = "unet"):
    """Load an iter_<N>.pth file and convert (requires torch)."""
    import torch
    sd = torch.load(path, map_location="cpu")
    if model == "vnet":
        return convert_vnet_state_dict(sd)
    return convert_unet_state_dict(sd)
