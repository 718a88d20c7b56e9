"""String -> model factories, mirroring the reference dispatch tables
(networks/net_factory_args.py:14-38, networks/net_factory_3dArgs.py:8-23).

Every factory returns an *uninitialized* flax Module; parameters come from
``module.init``. The ARCO forward contract is (logits, latent, feature_maps).
"""

from __future__ import annotations

import jax.numpy as jnp


def net_factory(net_type: str = "unet", in_chns: int = 1, class_num: int = 3,
                dtype=jnp.float32, **kwargs):
    from arco_tpu.models import unet2d
    if net_type == "unet":
        return unet2d.UNet(in_chns=in_chns, class_num=class_num, dtype=dtype)
    if net_type == "unet_ds":
        return unet2d.UNetDS(in_chns=in_chns, class_num=class_num, dtype=dtype)
    if net_type == "unet_cct":
        return unet2d.UNetCCT(in_chns=in_chns, class_num=class_num, dtype=dtype)
    if net_type == "unet_urpc":
        return unet2d.UNetURPC(in_chns=in_chns, class_num=class_num,
                               dtype=dtype)
    if net_type == "enet":
        from arco_tpu.models.enet import ENet
        return ENet(in_channels=in_chns, num_classes=class_num, dtype=dtype)
    if net_type == "pnet":
        from arco_tpu.models.pnet import PNet2D
        return PNet2D(in_chns=in_chns, num_classes=class_num, dtype=dtype)
    if net_type == "nnUNet":
        from arco_tpu.models.nnunet import initialize_network
        return initialize_network(num_classes=class_num, threeD=False,
                                  dtype=dtype)
    if net_type == "ViT_Seg":
        from arco_tpu.models.transunet import VisionTransformerSeg
        return VisionTransformerSeg(num_classes=class_num, in_chns=in_chns,
                                    dtype=dtype)
    if net_type == "efficient_unet":
        from arco_tpu.models.efficientunet import EffiUNet
        return EffiUNet(num_classes=class_num, in_chns=in_chns, dtype=dtype)
    if net_type == "swin_unet":
        from arco_tpu.models.swin_unet import SwinUnet
        return SwinUnet(num_classes=class_num, in_chns=in_chns, dtype=dtype)
    if net_type == "unet_har":
        from arco_tpu.models.unet2d_variants import UNetHAR
        return UNetHAR(in_chns=in_chns, class_num=class_num, dtype=dtype)
    if net_type == "unet_stego":
        from arco_tpu.models.unet2d_variants import UNetSTEGO
        return UNetSTEGO(in_chns=in_chns, class_num=class_num, dtype=dtype)
    raise NotImplementedError(
        f"net_type={net_type!r} not available yet in arco_tpu "
        "(reference parity set: unet, enet, unet_ds, unet_cct, unet_urpc, "
        "efficient_unet, ViT_Seg, pnet, nnUNet)")


def net_factory_3d(net_type: str = "unet_3D", in_chns: int = 1,
                   class_num: int = 2, dtype=jnp.float32, **kwargs):
    if net_type == "vnet":
        from arco_tpu.models.vnet3d import VNet
        return VNet(n_channels=in_chns, n_classes=class_num,
                    has_dropout=True, dtype=dtype)
    if net_type == "unet_3D":
        from arco_tpu.models.unet3d import UNet3D
        return UNet3D(in_channels=in_chns, n_classes=class_num, dtype=dtype)
    if net_type == "unet_3D_dv_semi":
        from arco_tpu.models.unet3d import UNet3DDVSemi
        return UNet3DDVSemi(in_channels=in_chns, n_classes=class_num,
                            dtype=dtype)
    if net_type == "attention_unet":
        from arco_tpu.models.unet3d import AttentionUNet3D
        return AttentionUNet3D(in_channels=in_chns, n_classes=class_num,
                               dtype=dtype)
    if net_type == "voxresnet":
        from arco_tpu.models.voxresnet import VoxResNet
        return VoxResNet(in_chns=in_chns, class_num=class_num, dtype=dtype)
    if net_type == "nnUNet":
        from arco_tpu.models.nnunet import initialize_network
        return initialize_network(num_classes=class_num, threeD=True,
                                  dtype=dtype)
    raise NotImplementedError(
        f"net_type={net_type!r} not available yet in arco_tpu "
        "(reference parity set: unet_3D, attention_unet, voxresnet, vnet, "
        "nnUNet)")
