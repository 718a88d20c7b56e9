"""Torch state_dict -> Flax converters for the rest of the model zoo
(VERDICT r3 item 6): enet, pnet, voxresnet, unet_3D, unet_3D_dv_semi,
attention_unet, and the STEGO/HAR U-Net variants.

Each converter mirrors the reference torch module tree (file:line cited per
function) onto the arco_tpu Flax module's auto-generated names, returning
(params, batch_stats) ready for ``model.apply``. Together with
tests/test_zoo_parity.py these are both the user-facing .pth migration path
and the strongest architecture-parity proof for every factory key.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from arco_tpu.compat.torch_import import (_bn, _conv, _conv3d, _conv_block,
                                          _convT, _dense, _np_sd)


def _to_jnp(tree):
    import jax.numpy as jnp
    return {k: _to_jnp(v) if isinstance(v, dict) else jnp.asarray(v)
            for k, v in tree.items()}


def _prelu(sd, prefix):
    return {"alpha": np.asarray(sd[f"{prefix}.weight"])}


# ------------------------------------------------------------------ PNet2D

def convert_pnet_state_dict(sd: Dict) -> Tuple[Dict, Dict]:
    """networks/pnet.py:87-122: block1..block5 (conv1/in1/conv2/in2 —
    `in*` are BatchNorm2d despite the name), catblock.conv1/conv2,
    out.conv1/conv2."""
    sd = _np_sd(sd)
    params, stats = {}, {}
    for b in range(5):
        bp, bs = {}, {}
        for j in (1, 2):
            bp[f"Conv_{j - 1}"] = _conv(sd, f"block{b + 1}.conv{j}")
            p, s = _bn(sd, f"block{b + 1}.in{j}")
            bp[f"BatchNorm_{j - 1}"], bs[f"BatchNorm_{j - 1}"] = p, s
        params[f"PNetBlock_{b}"], stats[f"PNetBlock_{b}"] = bp, bs
    params["Conv_0"] = _conv(sd, "catblock.conv1")
    params["Conv_1"] = _conv(sd, "catblock.conv2")
    params["Conv_2"] = _conv(sd, "out.conv1")
    params["Conv_3"] = _conv(sd, "out.conv2")
    return _to_jnp(params), _to_jnp(stats)


# --------------------------------------------------------------- VoxResNet

def convert_voxresnet_state_dict(sd: Dict) -> Tuple[Dict, Dict]:
    """networks/VoxResNet.py:79-116: conv1 stem, res1..6 (block Sequential:
    convs at .2/.5; InstanceNorm3d has no state), up1/up2
    (conv.conv_conv.2/.5), out head. batch_stats is empty — every norm is
    non-affine InstanceNorm."""
    sd = _np_sd(sd)
    params = {"Conv_0": _conv3d(sd, "conv1")}
    for r in range(6):
        params[f"VoxRex_{r}"] = {
            "Conv_0": _conv3d(sd, f"res{r + 1}.block.2"),
            "Conv_1": _conv3d(sd, f"res{r + 1}.block.5")}
    for u in range(2):
        params[f"UpBlock_{u}"] = {
            "Conv_0": _conv3d(sd, f"up{u + 1}.conv.conv_conv.2"),
            "Conv_1": _conv3d(sd, f"up{u + 1}.conv.conv_conv.5")}
    params["Conv_1"] = _conv3d(sd, "out")
    return _to_jnp(params), {}


# ------------------------------------------------------- unet_3D (+dv_semi)

def _unet_conv3(sd, prefix):
    """networks/utils.py:99-124 UnetConv3: conv1.0 / conv2.0 (InstanceNorm3d
    at .1 holds no state)."""
    return {"Conv_0": _conv3d(sd, f"{prefix}.conv1.0"),
            "Conv_1": _conv3d(sd, f"{prefix}.conv2.0")}


def convert_unet3d_state_dict(sd: Dict) -> Tuple[Dict, Dict]:
    """networks/unet_3D.py:20-100: conv1..4 + center (UnetConv3),
    up_concat4..1 (UnetUp3_CT -> .conv), final."""
    sd = _np_sd(sd)
    params = {}
    for i, name in enumerate(("conv1", "conv2", "conv3", "conv4", "center")):
        params[f"UnetConv3_{i}"] = _unet_conv3(sd, name)
    for i, name in enumerate(("up_concat4", "up_concat3", "up_concat2",
                              "up_concat1")):
        params[f"UnetUp3CT_{i}"] = {
            "UnetConv3_0": _unet_conv3(sd, f"{name}.conv")}
    params["Conv_0"] = _conv3d(sd, "final")
    return _to_jnp(params), {}


def convert_unet3d_dv_semi_state_dict(sd: Dict) -> Tuple[Dict, Dict]:
    """networks/unet_3D_dv_semi.py:13-112: unet_3D trunk + dsv1 plain conv
    and dsv2..4 UnetDsv3 (conv at .dsv.0)."""
    sd = _np_sd(sd)
    params = {}
    for i, name in enumerate(("conv1", "conv2", "conv3", "conv4", "center")):
        params[f"UnetConv3_{i}"] = _unet_conv3(sd, name)
    for i, name in enumerate(("up_concat4", "up_concat3", "up_concat2",
                              "up_concat1")):
        params[f"UnetUp3CT_{i}"] = {
            "UnetConv3_0": _unet_conv3(sd, f"{name}.conv")}
    params["dsv1"] = _conv3d(sd, "dsv1")
    for k in (2, 3, 4):
        params[f"dsv{k}"] = _conv3d(sd, f"dsv{k}.dsv.0")
    return _to_jnp(params), {}


# ---------------------------------------------------------- attention_unet

def _grid_attention(sd, prefix):
    """grid_attention_layer.py:46-58: theta (k=s=sub_sample, no bias),
    phi/psi 1x1 with bias, W = conv1x1 + BatchNorm."""
    p = {"Conv_0": _conv3d(sd, f"{prefix}.theta"),
         "Conv_1": _conv3d(sd, f"{prefix}.phi"),
         "Conv_2": _conv3d(sd, f"{prefix}.psi"),
         "Conv_3": _conv3d(sd, f"{prefix}.W.0")}
    bn_p, bn_s = _bn(sd, f"{prefix}.W.1")
    p["BatchNorm_0"] = bn_p
    return p, {"BatchNorm_0": bn_s}


def convert_attention_unet_state_dict(sd: Dict) -> Tuple[Dict, Dict]:
    """networks/attention_unet.py:9-112: trunk convs, gating
    (UnetGridGatingSignal3 conv1.0), attentionblock4/3/2 (each TWO
    GridAttentionBlock3D + combine_gates conv/bn), up_concat4..1, dsv
    deep-supervision head, final."""
    sd = _np_sd(sd)
    params, stats = {}, {}
    for i, name in enumerate(("conv1", "conv2", "conv3", "conv4", "center")):
        params[f"UnetConv3_{i}"] = _unet_conv3(sd, name)
    params["Conv_0"] = _conv3d(sd, "gating.conv1.0")
    # creation order: MultiAttentionBlock_0 gates conv4 (attentionblock4)
    for i, blk in enumerate(("attentionblock4", "attentionblock3",
                             "attentionblock2")):
        mp, ms = {}, {}
        for g in range(2):
            gp, gs = _grid_attention(sd, f"{blk}.gate_block_{g + 1}")
            mp[f"GridAttentionBlock3D_{g}"] = gp
            ms[f"GridAttentionBlock3D_{g}"] = gs
        mp["Conv_0"] = _conv3d(sd, f"{blk}.combine_gates.0")
        bn_p, bn_s = _bn(sd, f"{blk}.combine_gates.1")
        mp["BatchNorm_0"], ms["BatchNorm_0"] = bn_p, bn_s
        params[f"MultiAttentionBlock_{i}"] = mp
        stats[f"MultiAttentionBlock_{i}"] = ms
    for i, name in enumerate(("up_concat4", "up_concat3", "up_concat2",
                              "up_concat1")):
        params[f"UnetUp3CT_{i}"] = {
            "UnetConv3_0": _unet_conv3(sd, f"{name}.conv")}
    params["dsv1"] = _conv3d(sd, "dsv1")
    for k in (2, 3, 4):
        params[f"dsv{k}"] = _conv3d(sd, f"dsv{k}.dsv.0")
    params["final"] = _conv3d(sd, "final")
    return _to_jnp(params), _to_jnp(stats)


# -------------------------------------------------------------------- ENet

def _enet_seq(sd, prefix, n_convs, prelu, conv_start=0, bn_start=0,
              prelu_start=0, names=None):
    """Map a torch Sequential of [conv, bn, act] triplets onto flax
    Conv_i/BatchNorm_i/PReLU_i names starting at the given indices."""
    p, s = {}, {}
    for j in range(n_convs):
        p[f"Conv_{conv_start + j}"] = _conv(sd, f"{prefix}.{3 * j}")
        bn_p, bn_s = _bn(sd, f"{prefix}.{3 * j + 1}")
        p[f"BatchNorm_{bn_start + j}"] = bn_p
        s[f"BatchNorm_{bn_start + j}"] = bn_s
        if prelu:
            p[f"PReLU_{prelu_start + j}"] = _prelu(sd, f"{prefix}.{3 * j + 2}")
    return p, s


def _enet_regular(sd, prefix, asym, prelu):
    """RegularBottleneck (enet.py:71-207): ext_conv1 + ext_conv2 (1 conv, or
    2 for asymmetric) + ext_conv3 + out_activation."""
    p, s = _enet_seq(sd, f"{prefix}.ext_conv1", 1, prelu)
    n2 = 2 if asym else 1
    p2, s2 = _enet_seq(sd, f"{prefix}.ext_conv2", n2, prelu,
                       conv_start=1, bn_start=1, prelu_start=1)
    p.update(p2), s.update(s2)
    p3, s3 = _enet_seq(sd, f"{prefix}.ext_conv3", 1, prelu,
                       conv_start=1 + n2, bn_start=1 + n2,
                       prelu_start=1 + n2)
    p.update(p3), s.update(s3)
    if prelu:
        p[f"PReLU_{2 + n2}"] = _prelu(sd, f"{prefix}.out_activation")
    return p, s


def _enet_down(sd, prefix, prelu):
    """DownsamplingBottleneck (enet.py:209-338)."""
    p, s = {}, {}
    for j, name in enumerate(("ext_conv1", "ext_conv2", "ext_conv3")):
        pj, sj = _enet_seq(sd, f"{prefix}.{name}", 1, prelu, conv_start=j,
                           bn_start=j, prelu_start=j)
        p.update(pj), s.update(sj)
    if prelu:
        p["PReLU_3"] = _prelu(sd, f"{prefix}.out_activation")
    return p, s


def _enet_up(sd, prefix, prelu):
    """UpsamplingBottleneck (enet.py:340-451): main_conv1 (conv+bn),
    ext_conv1, ext_tconv1 (+_bnorm), ext_conv2. Decoder uses ReLU so no
    PReLU params in practice."""
    p, s = {"Conv_0": _conv(sd, f"{prefix}.main_conv1.0")}, {}
    bn_p, bn_s = _bn(sd, f"{prefix}.main_conv1.1")
    p["BatchNorm_0"], s["BatchNorm_0"] = bn_p, bn_s
    p["Conv_1"] = _conv(sd, f"{prefix}.ext_conv1.0")
    bn_p, bn_s = _bn(sd, f"{prefix}.ext_conv1.1")
    p["BatchNorm_1"], s["BatchNorm_1"] = bn_p, bn_s
    p["ConvTranspose_0"] = _convT(sd, f"{prefix}.ext_tconv1")
    bn_p, bn_s = _bn(sd, f"{prefix}.ext_tconv1_bnorm")
    p["BatchNorm_2"], s["BatchNorm_2"] = bn_p, bn_s
    p["Conv_2"] = _conv(sd, f"{prefix}.ext_conv2.0")
    bn_p, bn_s = _bn(sd, f"{prefix}.ext_conv2.1")
    p["BatchNorm_3"], s["BatchNorm_3"] = bn_p, bn_s
    if prelu:
        for j, name in enumerate(("ext_conv1.2", "ext_tconv1_activation",
                                  "ext_conv2.2")):
            p[f"PReLU_{j}"] = _prelu(sd, f"{prefix}.{name}")
        p["PReLU_3"] = _prelu(sd, f"{prefix}.out_activation")
    return p, s


# reference top-level layout (enet.py:453-614): torch name -> (kind, asym)
_ENET_REGULARS = [
    ("regular1_1", False), ("regular1_2", False), ("regular1_3", False),
    ("regular1_4", False),
    ("regular2_1", False), ("dilated2_2", False), ("asymmetric2_3", True),
    ("dilated2_4", False), ("regular2_5", False), ("dilated2_6", False),
    ("asymmetric2_7", True), ("dilated2_8", False),
    ("regular3_0", False), ("dilated3_1", False), ("asymmetric3_2", True),
    ("dilated3_3", False), ("regular3_4", False), ("dilated3_5", False),
    ("asymmetric3_6", True), ("dilated3_7", False),
    ("regular4_1", False), ("regular4_2", False),
    ("regular5_1", False),
]


def convert_enet_state_dict(sd: Dict, encoder_relu: bool = False,
                            decoder_relu: bool = True) -> Tuple[Dict, Dict]:
    """networks/enet.py:453-614 -> arco_tpu.models.enet.ENet. Encoder blocks
    default to PReLU (scalar slope), decoder to ReLU."""
    sd = _np_sd(sd)
    params, stats = {}, {}

    ip = {"Conv_0": _conv(sd, "initial_block.main_branch")}
    bn_p, bn_s = _bn(sd, "initial_block.batch_norm")
    ip["BatchNorm_0"] = bn_p
    if not encoder_relu:
        ip["PReLU_0"] = _prelu(sd, "initial_block.out_activation")
    params["InitialBlock_0"] = ip
    stats["InitialBlock_0"] = {"BatchNorm_0": bn_s}

    for i, name in enumerate(("downsample1_0", "downsample2_0")):
        p, s = _enet_down(sd, name, not encoder_relu)
        params[f"DownsamplingBottleneck_{i}"] = p
        stats[f"DownsamplingBottleneck_{i}"] = s
    decoder_blocks = {"regular4_1", "regular4_2", "regular5_1"}
    for i, (name, asym) in enumerate(_ENET_REGULARS):
        relu = decoder_relu if name in decoder_blocks else encoder_relu
        p, s = _enet_regular(sd, name, asym, not relu)
        params[f"RegularBottleneck_{i}"] = p
        stats[f"RegularBottleneck_{i}"] = s
    for i, name in enumerate(("upsample4_0", "upsample5_0")):
        p, s = _enet_up(sd, name, not decoder_relu)
        params[f"UpsamplingBottleneck_{i}"] = p
        stats[f"UpsamplingBottleneck_{i}"] = s
    params["ConvTranspose_0"] = _convT(sd, "transposed_conv")
    return _to_jnp(params), _to_jnp(stats)


# ------------------------------------------------------------------ nnUNet

def _nn_conv_dlast(sd, prefix, transposed=False):
    """nnU-Net Conv3d whose torch spatial order is (depth, h, w) — the
    anisotropic axis is FIRST in torch ([1,2,2] pools, nnunet.py:489-490)
    but LAST in this framework's [B, H, W, D, C] layout, so kernels map
    (kd, kh, kw) -> (kh, kw, kd)."""
    w = np.asarray(sd[f"{prefix}.weight"])
    if transposed:
        # flax ConvTranspose paints the kernel spatially FLIPPED relative
        # to torch's adjoint-of-conv painting
        w = w.transpose(3, 4, 2, 0, 1)[::-1, ::-1, ::-1].copy()
    else:
        w = w.transpose(3, 4, 2, 1, 0)
    p = {"kernel": w}
    if f"{prefix}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return p


def _nn_block(sd, prefix):
    """ConvDropoutNormNonlin (nnunet.py:42-86): .conv + .instnorm
    (InstanceNorm3d affine=True — stateless at eval, only scale/bias)."""
    return {"Conv_0": _nn_conv_dlast(sd, f"{prefix}.conv"),
            "InstanceNormAffine_0": {
                "scale": np.asarray(sd[f"{prefix}.instnorm.weight"]),
                "bias": np.asarray(sd[f"{prefix}.instnorm.bias"])}}


def convert_nnunet_state_dict(sd: Dict, num_pool: int = 6,
                              conv_per_stage: int = 2) -> Tuple[Dict, Dict]:
    """networks/nnunet.py:186-478 Generic_UNet as built by
    initialize_network (nnunet.py:500-530: 6 pools, 2 convs/stage,
    convolutional pooling+upsampling, no deep supervision) ->
    arco_tpu.models.nnunet.GenericUNet. batch_stats is empty (InstanceNorm
    holds no running state).

    Torch tree: conv_blocks_context.{0..5}.blocks.{j}, the bottleneck
    Sequential conv_blocks_context.6.{0,1}.blocks.0, tu.{u} transposed
    convs, conv_blocks_localization.{u}.{0,1}.blocks.0, and one seg head
    per stage of which only the finest (seg_outputs.{num_pool-1}) is live
    without deep supervision (nnunet.py:430-433)."""
    sd = _np_sd(sd)
    params = {}
    for d in range(num_pool):
        params[f"StackedConvLayers_{d}"] = {
            f"ConvNormLRelu_{j}": _nn_block(
                sd, f"conv_blocks_context.{d}.blocks.{j}")
            for j in range(conv_per_stage)}
    params[f"StackedConvLayers_{num_pool}"] = {
        f"ConvNormLRelu_{j}": _nn_block(
            sd, f"conv_blocks_context.{num_pool}.0.blocks.{j}")
        for j in range(conv_per_stage - 1)}
    params[f"StackedConvLayers_{num_pool + 1}"] = {
        "ConvNormLRelu_0": _nn_block(
            sd, f"conv_blocks_context.{num_pool}.1.blocks.0")}
    for u in range(num_pool):
        params[f"ConvTranspose_{u}"] = _nn_conv_dlast(sd, f"tu.{u}",
                                                      transposed=True)
        params[f"StackedConvLayers_{num_pool + 2 + 2 * u}"] = {
            f"ConvNormLRelu_{j}": _nn_block(
                sd, f"conv_blocks_localization.{u}.0.blocks.{j}")
            for j in range(conv_per_stage - 1)}
        params[f"StackedConvLayers_{num_pool + 3 + 2 * u}"] = {
            "ConvNormLRelu_0": _nn_block(
                sd, f"conv_blocks_localization.{u}.1.blocks.0")}
    params["Conv_0"] = _nn_conv_dlast(sd, f"seg_outputs.{num_pool - 1}")
    return _to_jnp(params), {}


# ------------------------------------------------------------- STEGO / HAR

def convert_unet_stego_state_dict(sd: Dict) -> Tuple[Dict, Dict]:
    """unetWithArgsSTEGO.py:316-360: standard UNet encoder/decoder naming
    plus decoder.nonLinearPro.{0,2} cluster head; the flax UNetSTEGO inlines
    the decoder (Encoder_0 + top-level BilinearUp/ConvBlock2D/Conv names)."""
    sd = _np_sd(sd)
    enc_p, enc_s = {}, {}
    p, s = _conv_block(sd, "encoder.in_conv")
    enc_p["ConvBlock2D_0"], enc_s["ConvBlock2D_0"] = p, s
    for k in range(1, 5):
        p, s = _conv_block(sd, f"encoder.down{k}.maxpool_conv.1")
        enc_p[f"ConvBlock2D_{k}"], enc_s[f"ConvBlock2D_{k}"] = p, s
    params = {"Encoder_0": enc_p}
    stats = {"Encoder_0": enc_s}
    for k in range(1, 5):
        params[f"BilinearUp_{k - 1}"] = {
            "Conv_0": _conv(sd, f"decoder.up{k}.conv1x1")}
        p, s = _conv_block(sd, f"decoder.up{k}.conv")
        params[f"ConvBlock2D_{k - 1}"], stats[f"ConvBlock2D_{k - 1}"] = p, s
    params["Conv_0"] = _conv(sd, "decoder.out_conv")
    params["Conv_1"] = _conv(sd, "decoder.nonLinearPro.0")
    params["Conv_2"] = _conv(sd, "decoder.nonLinearPro.2")
    return _to_jnp(params), _to_jnp(stats)


def _har_conv_block(sd, prefix):
    """unetWithArgs_HAR.py:47-70 ConvBlock: conv1/bn1/conv2/bn2 where bn* is
    BatchNorm2dMul (non-affine .bn + explicit gamma/beta)."""
    p, s = {}, {}
    for j in (1, 2):
        p[f"Conv_{j - 1}"] = _conv(sd, f"{prefix}.conv{j}")
        p[f"BatchNormMul_{j - 1}"] = {
            "gamma": np.asarray(sd[f"{prefix}.bn{j}.gamma"]),
            "beta": np.asarray(sd[f"{prefix}.bn{j}.beta"])}
        s[f"BatchNormMul_{j - 1}"] = {"BatchNorm_0": {
            "mean": np.asarray(sd[f"{prefix}.bn{j}.bn.running_mean"]),
            "var": np.asarray(sd[f"{prefix}.bn{j}.bn.running_var"])}}
    return p, s


def convert_unet_har_state_dict(sd: Dict) -> Tuple[Dict, Dict]:
    """unetWithArgs_HAR.py:352-474: encoder.in_conv + encoder.down1..4
    (DownBlock exposes .convBlock, NOT maxpool_conv), decoder.up1..4
    (conv1x1 + .conv), decoder.out_conv. The flax UNetHAR is flat:
    ConvBlockHAR_0..4 encoder, BilinearUp_0..3 + ConvBlockHAR_5..8 decoder,
    Conv_0 head."""
    sd = _np_sd(sd)
    params, stats = {}, {}
    p, s = _har_conv_block(sd, "encoder.in_conv")
    params["ConvBlockHAR_0"], stats["ConvBlockHAR_0"] = p, s
    for k in range(1, 5):
        p, s = _har_conv_block(sd, f"encoder.down{k}.convBlock")
        params[f"ConvBlockHAR_{k}"], stats[f"ConvBlockHAR_{k}"] = p, s
    for k in range(1, 5):
        params[f"BilinearUp_{k - 1}"] = {
            "Conv_0": _conv(sd, f"decoder.up{k}.conv1x1")}
        p, s = _har_conv_block(sd, f"decoder.up{k}.conv")
        params[f"ConvBlockHAR_{k + 4}"], stats[f"ConvBlockHAR_{k + 4}"] = p, s
    params["Conv_0"] = _conv(sd, "decoder.out_conv")
    return _to_jnp(params), _to_jnp(stats)


# ----------------------------------------------------------------- VGG

def convert_vgg19_features_state_dict(sd: Dict) -> Dict:
    """torchvision-layout VGG-19 trunk (features.{i}.weight, no BN) ->
    models.vgg.VGG19Features params (Conv_0..Conv_15 in call order). Only
    the conv trunk is consumed (feature_extraction.py:87-220 slices relus
    off vgg19.features)."""
    from arco_tpu.models.vgg import VGG19_CFG

    sd = _np_sd(sd)
    params, ti, ci = {}, 0, 0
    for v in VGG19_CFG:
        if v == "M":
            ti += 1
            continue
        params[f"Conv_{ci}"] = _conv(sd, f"features.{ti}")
        ti += 2  # conv + inplace relu
        ci += 1
    return _to_jnp(params)


def _dense_from_nchw_flatten(sd, prefix, ch: int, spatial: Tuple[int, int]):
    """torch Linear over an NCHW flatten (index c*H*W + h*W + w) -> flax
    Dense over the NHWC flatten (index h*W*C + w*C + c)."""
    w = np.asarray(sd[f"{prefix}.weight"])          # [out, c*h*w]
    out_dim = w.shape[0]
    w = w.reshape(out_dim, ch, *spatial).transpose(0, 2, 3, 1)
    return {"kernel": w.reshape(out_dim, -1).T.copy(),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def convert_deepcluster_vgg16_state_dict(
        sd: Dict, batch_norm: bool = True, include_top: bool = True,
        final_spatial: Tuple[int, int] = (7, 7)) -> Tuple[Dict, Dict]:
    """models/deepcluster_vgg16.py VGG -> models.vgg.DeepClusterVGG16.

    Torch tree: features.{i} sequential (conv[, bn], relu | pool),
    classifier.{0,3} Linears, top_layer Linear; sobel.* keys are the fixed
    grayscale/Sobel constants (deepcluster_vgg16.py:23-37) — hardcoded in
    the flax module, so they are skipped here. The first classifier Linear
    reads the NCHW flatten; _dense_from_nchw_flatten permutes it for the
    NHWC flatten."""
    from arco_tpu.models.vgg import VGG16_CFG

    sd = _np_sd(sd)
    params, stats, ti, ci = {}, {}, 0, 0
    for v in VGG16_CFG:
        if v == "M":
            ti += 1
            continue
        params[f"Conv_{ci}"] = _conv(sd, f"features.{ti}")
        ti += 1
        if batch_norm:
            bn_p, bn_s = _bn(sd, f"features.{ti}")
            params[f"BatchNorm_{ci}"] = bn_p
            stats[f"BatchNorm_{ci}"] = bn_s
            ti += 1
        ti += 1  # relu
        ci += 1
    params["Dense_0"] = _dense_from_nchw_flatten(sd, "classifier.0", 512,
                                                 final_spatial)
    params["Dense_1"] = _dense(sd, "classifier.3")
    if include_top and "top_layer.weight" in sd:
        params["Dense_2"] = _dense(sd, "top_layer")
    return _to_jnp(params), _to_jnp(stats)
