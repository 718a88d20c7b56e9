"""Checkpoint compatibility: reference .pth importers (UNet/VNet) and
local-file pretrained-backbone importers (ViT .npz, Swin .pth,
EfficientNet .pth)."""

from arco_tpu.compat.pretrained import (convert_efficientnet_state_dict,
                                        convert_swin_state_dict,
                                        convert_vit_npz, deep_merge,
                                        load_pretrained)
from arco_tpu.compat.torch_import import (convert_unet_state_dict,
                                          convert_vnet_state_dict,
                                          load_reference_checkpoint)

__all__ = [
    "convert_efficientnet_state_dict", "convert_swin_state_dict",
    "convert_vit_npz", "deep_merge", "load_pretrained",
    "convert_unet_state_dict", "convert_vnet_state_dict",
    "load_reference_checkpoint",
]
