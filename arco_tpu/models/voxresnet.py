"""VoxResNet — 3D residual network with instance-norm pre-activation.

Parity target: networks/VoxResNet.py:79-116 — stem conv + maxpool, six
VoxRex residual blocks with two more maxpools, two trilinear-upsample concat
UpBlocks, final upsample + 1x1 head. Channels-last NDHWC.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from arco_tpu.models.layers import max_pool
from arco_tpu.ops.interpolate import resize_bilinear


class InstanceNorm(nn.Module):
    """torch InstanceNorm3d default: no affine, per-sample per-channel."""
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        axes = tuple(range(1, x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.var(xf, axis=axes, keepdims=True)
        return ((xf - mean) / jnp.sqrt(var + self.epsilon)).astype(x.dtype)


class VoxRex(nn.Module):
    """Pre-activation residual block (VoxResNet.py:26-41)."""
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(InstanceNorm()(x))
        h = nn.Conv(self.channels, (3, 3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(h)
        h = nn.relu(InstanceNorm()(h))
        h = nn.Conv(self.channels, (3, 3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(h)
        return h + x


class UpBlock(nn.Module):
    """Trilinear upsample + concat + pre-act double conv
    (VoxResNet.py:44-77)."""
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        x1 = resize_bilinear(x1, x2.shape[1:-1], align_corners=True)
        h = jnp.concatenate([x2, x1], axis=-1)
        h = nn.relu(InstanceNorm()(h))
        h = nn.Conv(self.out_channels, (3, 3, 3), padding="SAME",
                    use_bias=False, dtype=self.dtype)(h)
        h = nn.relu(InstanceNorm()(h))
        h = nn.Conv(self.out_channels, (3, 3, 3), padding="SAME",
                    use_bias=False, dtype=self.dtype)(h)
        return h


class VoxResNet(nn.Module):
    in_chns: int = 1
    feature_chns: int = 64
    class_num: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        f = self.feature_chns
        x = nn.Conv(f, (3, 3, 3), padding="SAME", dtype=self.dtype)(x)
        x = max_pool(x)
        x1 = VoxRex(f, self.dtype)(x)
        x2 = VoxRex(f, self.dtype)(x1)
        x2_pool = max_pool(x2)
        x3 = VoxRex(f, self.dtype)(x2_pool)
        x4 = max_pool(VoxRex(f, self.dtype)(x3))
        x5 = VoxRex(f, self.dtype)(x4)
        x6 = VoxRex(f, self.dtype)(x5)
        up1 = UpBlock(f, self.dtype)(x6, x2_pool)
        up2 = UpBlock(f, self.dtype)(up1, x)
        up = resize_bilinear(up2, tuple(2 * s for s in up2.shape[1:-1]),
                             align_corners=True)
        logits = nn.Conv(self.class_num, (1, 1, 1), dtype=self.dtype)(up)
        return logits, x6, [x6, up1, up2]
