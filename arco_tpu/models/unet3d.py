"""Çiçek-style 3D U-Net and grid-attention variant, channels-last.

Parity targets:
- unet_3D (networks/unet_3D.py:20-100): filters [64,128,256,512,1024] /
  feature_scale, UnetConv3 double-conv blocks (networks/utils.py:99),
  trilinear-upsample UnetUp3_CT decoder (networks/utils.py:260), dropout 0.3
  at the bottleneck and before the head.
- Attention_UNet (networks/attention_unet.py:9-135): same trunk with grid
  attention gates (GridAttentionBlock3D 'concatenation' mode,
  networks/grid_attention_layer.py:7-180) on skips 2-4 and a gating signal
  from the bottleneck.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from arco_tpu.models.layers import max_pool
from arco_tpu.ops.interpolate import resize_bilinear


class InstanceNorm(nn.Module):
    """torch InstanceNorm3d default: NO affine params, NO running stats —
    per-sample per-channel normalisation (what networks/utils.py:104-109
    actually builds when is_batchnorm=True)."""
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        axes = tuple(range(1, x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.var(xf, axis=axes, keepdims=True)
        return ((xf - mean) / jnp.sqrt(var + self.epsilon)).astype(x.dtype)


class UnetConv3(nn.Module):
    """Double (Conv3 + InstanceNorm + ReLU) (networks/utils.py:99-124 —
    despite the flag name `is_batchnorm`, the reference normalisation is
    nn.InstanceNorm3d)."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3, 3), padding="SAME",
                        dtype=self.dtype)(x)
            x = InstanceNorm()(x)
            x = nn.relu(x)
        return x


class UnetUp3CT(nn.Module):
    """Trilinear upsample + concat + UnetConv3 (networks/utils.py:260-278;
    nn.Upsample's align_corners defaults to False)."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, skip, x, train: bool = True):
        x = resize_bilinear(x, skip.shape[1:-1], align_corners=False)
        return UnetConv3(self.features, self.dtype)(
            jnp.concatenate([skip, x], axis=-1), train)


class UNet3D(nn.Module):
    feature_scale: int = 4
    n_classes: int = 21
    in_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        filters = [int(f / self.feature_scale)
                   for f in (64, 128, 256, 512, 1024)]
        convs = []
        h = x
        for f in filters[:4]:
            h = UnetConv3(f, self.dtype)(h, train)
            convs.append(h)
            h = max_pool(h)
        center = UnetConv3(filters[4], self.dtype)(h, train)
        center = nn.Dropout(0.3, deterministic=not train)(center)

        feature_map = [center]
        h = center
        for f, skip in zip(filters[3::-1], convs[::-1]):
            h = UnetUp3CT(f, self.dtype)(skip, h, train)
            feature_map.append(h)
        h = nn.Dropout(0.3, deterministic=not train)(h)
        logits = nn.Conv(self.n_classes, (1, 1, 1), dtype=self.dtype)(h)
        return logits, center, feature_map


class UNet3DDVSemi(nn.Module):
    """Deep-supervised semi-supervised 3D U-Net
    (networks/unet_3D_dv_semi.py:13-112): the UNet3D trunk with per-scale
    dsv heads (1x1x1 conv + trilinear upsample to full size); returns the
    four supervision outputs fine->coarse."""
    feature_scale: int = 4
    n_classes: int = 21
    in_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        filters = [int(f / self.feature_scale)
                   for f in (64, 128, 256, 512, 1024)]
        size = x.shape[1:-1]
        convs = []
        h = x
        for f in filters[:4]:
            h = UnetConv3(f, self.dtype)(h, train)
            convs.append(h)
            h = max_pool(h)
        center = UnetConv3(filters[4], self.dtype)(h, train)

        # per-stage CHANNEL dropout after each decoder block
        # (unet_3D_dv_semi.py:63-66, 91-101: Dropout3d p=0.5/0.3/0.2/0.1;
        # Dropout3d zeroes whole feature maps -> broadcast over spatial)
        ups = []
        h = center
        for f, skip, p in zip(filters[3::-1], convs[::-1],
                              (0.5, 0.3, 0.2, 0.1)):
            h = UnetUp3CT(f, self.dtype)(skip, h, train)
            h = nn.Dropout(p, deterministic=not train,
                           broadcast_dims=(1, 2, 3))(h)
            ups.append(h)

        outs = []
        for k, u in enumerate(ups[::-1]):   # fine -> coarse supervision
            dsv = nn.Conv(self.n_classes, (1, 1, 1), dtype=self.dtype,
                          name=f"dsv{k + 1}")(u)
            if dsv.shape[1:-1] != size:
                dsv = resize_bilinear(dsv, size, align_corners=False)
            outs.append(dsv)
        return tuple(outs)


class GridAttentionBlock3D(nn.Module):
    """'concatenation' grid attention (grid_attention_layer.py:7-111):
    theta = k=stride=sub_sample conv (VALID, no bias), phi/psi = 1x1 with
    bias, attention resizes via F.upsample (align_corners=False), output
    transform W = 1x1 conv + BatchNorm."""
    inter_channels: int
    sub_sample: Sequence[int] = (2, 2, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, g, train: bool = True):
        ss = tuple(self.sub_sample)
        theta_x = nn.Conv(self.inter_channels, ss, strides=ss,
                          padding="VALID", use_bias=False,
                          dtype=self.dtype)(x)
        phi_g = nn.Conv(self.inter_channels, (1, 1, 1), dtype=self.dtype)(g)
        phi_g = resize_bilinear(phi_g, theta_x.shape[1:-1],
                                align_corners=False)
        f = nn.relu(theta_x + phi_g)
        psi = nn.Conv(1, (1, 1, 1), dtype=self.dtype)(f)
        sigm = nn.sigmoid(psi.astype(jnp.float32)).astype(x.dtype)
        sigm = resize_bilinear(sigm, x.shape[1:-1], align_corners=False)
        y = sigm * x
        w = nn.Conv(x.shape[-1], (1, 1, 1), dtype=self.dtype)(y)
        w = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(w)
        return w, sigm


class GridAttentionBlockTORR(nn.Module):
    """TORR grid-attention variants (grid_attention_layer.py:183-357),
    rank-generic (2D [B,H,W,C] or 3D [B,D,H,W,C] by input rank).

    Differences from the default block: sub_sample defaults to 1, phi is a
    strided conv over the gating map (not 1x1, :242-244), every projection
    is individually toggleable (use_theta/phi/psi/W identity fallbacks,
    :222-226), the optional BN after W (:229-236), and five attention
    normalisations (:320-351): softmax / mean / mean_flow /
    range_normalise / sigmoid over the flattened spatial axes. psi's bias
    initialises to 3.0 (sigmoid) or 10.0 (softmax) as at :266-270."""
    inter_channels: int
    mode: str = "concatenation_sigmoid"
    sub_sample: int = 1
    use_w: bool = True
    use_phi: bool = True
    use_theta: bool = True
    use_psi: bool = True
    bn_layer: bool = True
    nonlinearity1: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, g, train: bool = True):
        ndim = x.ndim - 2
        ss = (self.sub_sample,) * ndim
        ones = (1,) * ndim
        b = x.shape[0]

        theta_x = x
        if self.use_theta:
            theta_x = nn.Conv(self.inter_channels, ss, strides=ss,
                              use_bias=False, dtype=self.dtype)(x)
        phi_g = g
        if self.use_phi:
            phi_g = nn.Conv(self.inter_channels, ss, strides=ss,
                            use_bias=False, dtype=self.dtype)(g)
        if phi_g.shape[1:-1] != theta_x.shape[1:-1]:
            phi_g = resize_bilinear(phi_g, theta_x.shape[1:-1],
                                    align_corners=True)
        f = theta_x + phi_g
        if self.nonlinearity1 == "relu":
            f = nn.relu(f)
        psi_f = f
        if self.use_psi:
            bias_init = {"concatenation_sigmoid": 3.0,
                         "concatenation_softmax": 10.0}.get(self.mode, 0.0)
            psi_f = nn.Conv(
                1, ones, dtype=self.dtype,
                bias_init=nn.initializers.constant(bias_init))(f)

        if self.mode in ("concatenation_sigmoid", "concatenation"):
            # elementwise (:346-347) — also valid per-channel when psi is
            # toggled off
            sigm = jax.nn.sigmoid(psi_f.astype(jnp.float32)) \
                .astype(x.dtype)
        else:
            flat = psi_f.reshape(b, -1).astype(jnp.float32)
            if self.mode == "concatenation_softmax":
                att = jax.nn.softmax(flat, axis=1)
            elif self.mode == "concatenation_mean":
                att = flat / jnp.sum(flat, axis=1, keepdims=True)
            elif self.mode == "concatenation_mean_flow":
                shifted = flat - jnp.min(flat, axis=1, keepdims=True)
                att = shifted / jnp.sum(shifted, axis=1, keepdims=True)
            elif self.mode == "concatenation_range_normalise":
                lo = jnp.min(flat, axis=1, keepdims=True)
                hi = jnp.max(flat, axis=1, keepdims=True)
                att = (flat - lo) / (hi - lo)
            else:
                raise NotImplementedError(self.mode)
            sigm = att.reshape(psi_f.shape).astype(x.dtype)
        if sigm.shape[1:-1] != x.shape[1:-1]:
            sigm = resize_bilinear(sigm, x.shape[1:-1], align_corners=True)

        y = sigm * x
        w = y
        if self.use_w:
            w = nn.Conv(x.shape[-1], ones, dtype=self.dtype)(y)
            if self.bn_layer:
                w = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, dtype=self.dtype)(w)
        return w, sigm


class MultiAttentionBlock(nn.Module):
    """TWO parallel attention gates + combine conv over their concat
    (attention_unet.py:113-135: gate_block_1/gate_block_2/combine_gates =
    Conv1x1 + BatchNorm + ReLU)."""
    inter_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, g, train: bool = True):
        gate1, _ = GridAttentionBlock3D(self.inter_channels,
                                        dtype=self.dtype)(x, g, train)
        gate2, _ = GridAttentionBlock3D(self.inter_channels,
                                        dtype=self.dtype)(x, g, train)
        h = nn.Conv(x.shape[-1], (1, 1, 1), dtype=self.dtype)(
            jnp.concatenate([gate1, gate2], axis=-1))
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(h)
        return nn.relu(h)


class AttentionUNet3D(nn.Module):
    feature_scale: int = 4
    n_classes: int = 21
    in_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        filters = [int(f / self.feature_scale)
                   for f in (64, 128, 256, 512, 1024)]
        convs = []
        h = x
        for f in filters[:4]:
            h = UnetConv3(f, self.dtype)(h, train)
            convs.append(h)
            h = max_pool(h)
        center = UnetConv3(filters[4], self.dtype)(h, train)
        # gating signal (UnetGridGatingSignal3, networks/utils.py:192-212:
        # Conv1x1 + InstanceNorm + ReLU)
        gate = nn.Conv(filters[4], (1, 1, 1), dtype=self.dtype)(center)
        gate = nn.relu(InstanceNorm()(gate))

        feature_map = [center]
        g4 = MultiAttentionBlock(filters[3], self.dtype)(convs[3], gate,
                                                         train)
        up4 = UnetUp3CT(filters[3], self.dtype)(g4, center, train)
        feature_map.append(up4)
        g3 = MultiAttentionBlock(filters[2], self.dtype)(convs[2], up4,
                                                         train)
        up3 = UnetUp3CT(filters[2], self.dtype)(g3, up4, train)
        feature_map.append(up3)
        g2 = MultiAttentionBlock(filters[1], self.dtype)(convs[1], up3,
                                                         train)
        up2 = UnetUp3CT(filters[1], self.dtype)(g2, up3, train)
        feature_map.append(up2)
        up1 = UnetUp3CT(filters[0], self.dtype)(convs[0], up2, train)
        feature_map.append(up1)

        # deep supervision head (attention_unet.py:54-61, 101-105):
        # dsv4/3/2 = Conv1x1 + trilinear x8/x4/x2 (UnetDsv3,
        # networks/utils.py:455-462, align_corners=False), dsv1 = Conv1x1;
        # final = Conv1x1 over concat [dsv1, dsv2, dsv3, dsv4]
        size = x.shape[1:-1]
        dsvs = []
        for name, u in (("dsv4", up4), ("dsv3", up3), ("dsv2", up2)):
            d = nn.Conv(self.n_classes, (1, 1, 1), dtype=self.dtype,
                        name=name)(u)
            dsvs.append(resize_bilinear(d, size, align_corners=False))
        dsv1 = nn.Conv(self.n_classes, (1, 1, 1), dtype=self.dtype,
                       name="dsv1")(up1)
        cat = jnp.concatenate([dsv1, dsvs[2], dsvs[1], dsvs[0]], axis=-1)
        logits = nn.Conv(self.n_classes, (1, 1, 1), dtype=self.dtype,
                         name="final")(cat)
        return logits, center, feature_map
