"""GAN/legacy helpers completing networks/networks_other.py parity.

Reference symbols (file:line in /root/reference/code/networks/networks_other.py):
GANLoss :260, ResnetGenerator :301 (+ ResnetBlock :354), UnetGenerator :400
(+ UnetSkipConnectionBlock :427), NLayerDiscriminator :481, define_G :143,
define_D :167, get_n_parameters :196. These are pix2pix/CycleGAN-era modules
unused by ARCO's main training path but part of the component inventory.

TPU-native design notes:
- channels-last NHWC (XLA's preferred conv layout), flax linen modules;
- the reference's reflection padding is expressed via ``jnp.pad`` with
  mode='reflect' before a VALID conv;
- norm switch mirrors get_norm_layer :78 ('batch' -> BatchNorm,
  'instance' -> GroupNorm(group_size=1), the JAX-idiomatic instance norm);
- GANLoss drops the torch label-caching (a CPU-alloc workaround that is
  meaningless under jit) and is a pure function.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import linen as nn


def _norm(norm_type: str, use_running_average: bool = True):
    if norm_type == "batch":
        return nn.BatchNorm(use_running_average=use_running_average)
    if norm_type == "instance":
        return nn.GroupNorm(num_groups=None, group_size=1, use_bias=False,
                            use_scale=False)
    if norm_type == "none":
        return lambda x: x
    raise NotImplementedError(f"norm layer [{norm_type}] not found")


def _reflect_conv(x, features, kernel, strides=1, use_bias=True):
    pad = kernel // 2
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    return nn.Conv(features, (kernel, kernel), strides=(strides, strides),
                   padding="VALID", use_bias=use_bias)(x)


def gan_loss(pred, target_is_real: bool, use_lsgan: bool = True,
             real_label: float = 1.0, fake_label: float = 0.0):
    """networks_other.py:260-296 GANLoss as a pure function.

    LSGAN -> MSE against the label value; vanilla -> BCE on probabilities
    (the reference applies BCELoss to sigmoid outputs)."""
    target = jnp.full_like(pred, real_label if target_is_real else fake_label)
    if use_lsgan:
        return jnp.mean((pred - target) ** 2)
    eps = 1e-7
    p = jnp.clip(pred, eps, 1.0 - eps)
    return -jnp.mean(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))


class ResnetBlock(nn.Module):
    """networks_other.py:354-397: reflect-pad 3x3 conv + norm + ReLU (opt.
    dropout) twice, residual add."""
    features: int
    norm_type: str = "batch"
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # reference passes bias=use_bias (False under batch norm,
        # networks_other.py:372-388)
        use_bias = self.norm_type == "instance"
        h = _reflect_conv(x, self.features, 3, use_bias=use_bias)
        h = _norm(self.norm_type, not train)(h)
        h = nn.relu(h)
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=not train)(h)
        h = _reflect_conv(h, self.features, 3, use_bias=use_bias)
        h = _norm(self.norm_type, not train)(h)
        return x + h


class ResnetGenerator(nn.Module):
    """networks_other.py:301-351 (Johnson fast-neural-style topology):
    c7s1-ngf, 2 stride-2 downs, n_blocks residual blocks, 2 transposed-conv
    ups, c7s1-out, tanh."""
    output_nc: int
    ngf: int = 64
    n_blocks: int = 6
    norm_type: str = "batch"
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # bias=use_bias on every normed conv (networks_other.py:310-340);
        # the final c7s1-out conv keeps its bias (:341)
        use_bias = self.norm_type == "instance"
        x = _reflect_conv(x, self.ngf, 7, use_bias=use_bias)
        x = nn.relu(_norm(self.norm_type, not train)(x))
        for i in range(2):  # downsample
            mult = 2 ** i
            x = nn.Conv(self.ngf * mult * 2, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), use_bias=use_bias)(x)
            x = nn.relu(_norm(self.norm_type, not train)(x))
        for _ in range(self.n_blocks):
            x = ResnetBlock(self.ngf * 4, self.norm_type,
                            self.use_dropout)(x, train)
        for i in range(2):  # upsample
            mult = 2 ** (2 - i)
            x = nn.ConvTranspose(self.ngf * mult // 2, (3, 3),
                                 strides=(2, 2), padding="SAME",
                                 use_bias=use_bias)(x)
            x = nn.relu(_norm(self.norm_type, not train)(x))
        x = _reflect_conv(x, self.output_nc, 7)
        return jnp.tanh(x)


class UnetGenerator(nn.Module):
    """networks_other.py:400-478 (UnetGenerator + UnetSkipConnectionBlock):
    num_downs-level U-Net generator with 4x4 stride-2 down/up convs,
    channel widths capped at ngf*8.

    The torch version builds the recursion inner-out as nested
    UnetSkipConnectionBlocks (each block returns cat([its INPUT x,
    up(sub(down(x)))]) except the outermost); the explicit stack below
    reproduces that dataflow exactly:
    - down at level 0 (outermost): conv only (:446-450);
    - down at interior levels: norm(conv(lrelu(x))) (:459-461);
    - down innermost: conv(lrelu(x)), no norm (:453-456);
    - up: norm(convT(relu(h))) (+ tanh/no-norm at the outermost);
    - dropout 0.5 AFTER upnorm only in the (num_downs-5) middle ngf*8
      blocks, i.e. levels 4..num_downs-2 (:408-409, :466-469);
    - the skip concatenated at level L is the level's input tensor (:477).
    """
    output_nc: int
    num_downs: int = 7
    ngf: int = 64
    norm_type: str = "batch"
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # down-conv output width at each level, outermost first (:407-413)
        widths = [self.ngf * min(2 ** i, 8) for i in range(self.num_downs)]
        use_bias = self.norm_type == "instance"
        skips = []
        h = x
        for level in range(self.num_downs):
            skips.append(h)  # each block's skip is its own input (:477)
            inp = h if level == 0 else nn.leaky_relu(h, 0.2)
            h = nn.Conv(widths[level], (4, 4), strides=(2, 2),
                        padding=((1, 1), (1, 1)), use_bias=use_bias)(inp)
            if 0 < level < self.num_downs - 1:
                h = _norm(self.norm_type, not train)(h)
        for level in reversed(range(self.num_downs)):
            h = nn.relu(h)
            out_nc = self.output_nc if level == 0 else widths[level - 1]
            h = nn.ConvTranspose(out_nc, (4, 4), strides=(2, 2),
                                 padding="SAME",
                                 use_bias=True if level == 0 else use_bias)(h)
            if level == 0:
                return jnp.tanh(h)
            h = _norm(self.norm_type, not train)(h)
            if self.use_dropout and 4 <= level <= self.num_downs - 2:
                h = nn.Dropout(0.5, deterministic=not train)(h)
            h = jnp.concatenate([skips[level], h], axis=-1)
        return h


class NLayerDiscriminator(nn.Module):
    """networks_other.py:481-529: PatchGAN — n_layers 4x4 stride-2 convs
    (widths ndf*2^k capped at 8x), one stride-1, 1-channel head, optional
    sigmoid."""
    ndf: int = 64
    n_layers: int = 3
    norm_type: str = "batch"
    use_sigmoid: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_bias = self.norm_type == "instance"
        x = nn.Conv(self.ndf, (4, 4), strides=(2, 2),
                    padding=((1, 1), (1, 1)))(x)
        x = nn.leaky_relu(x, 0.2)
        for n in range(1, self.n_layers):
            mult = min(2 ** n, 8)
            x = nn.Conv(self.ndf * mult, (4, 4), strides=(2, 2),
                        padding=((1, 1), (1, 1)), use_bias=use_bias)(x)
            x = nn.leaky_relu(_norm(self.norm_type, not train)(x), 0.2)
        mult = min(2 ** self.n_layers, 8)
        x = nn.Conv(self.ndf * mult, (4, 4), strides=(1, 1),
                    padding=((1, 1), (1, 1)), use_bias=use_bias)(x)
        x = nn.leaky_relu(_norm(self.norm_type, not train)(x), 0.2)
        x = nn.Conv(1, (4, 4), strides=(1, 1), padding=((1, 1), (1, 1)))(x)
        if self.use_sigmoid:
            x = jax.nn.sigmoid(x)
        return x


def define_g(output_nc, ngf, which_model_netg, norm="batch",
             use_dropout=False):
    """networks_other.py:143-164 dispatch (input_nc is inferred from the
    input under flax lazy init, so it is not a constructor arg)."""
    if which_model_netg == "resnet_9blocks":
        return ResnetGenerator(output_nc, ngf, n_blocks=9, norm_type=norm,
                               use_dropout=use_dropout)
    if which_model_netg == "resnet_6blocks":
        return ResnetGenerator(output_nc, ngf, n_blocks=6, norm_type=norm,
                               use_dropout=use_dropout)
    if which_model_netg == "unet_128":
        return UnetGenerator(output_nc, 7, ngf, norm_type=norm,
                             use_dropout=use_dropout)
    if which_model_netg == "unet_256":
        return UnetGenerator(output_nc, 8, ngf, norm_type=norm,
                             use_dropout=use_dropout)
    raise NotImplementedError(
        f"Generator model name [{which_model_netg}] is not recognized")


def define_d(ndf, which_model_netd, n_layers_d=3, norm="batch",
             use_sigmoid=False):
    """networks_other.py:167-185 dispatch."""
    if which_model_netd == "basic":
        return NLayerDiscriminator(ndf, 3, norm, use_sigmoid)
    if which_model_netd == "n_layers":
        return NLayerDiscriminator(ndf, n_layers_d, norm, use_sigmoid)
    raise NotImplementedError(
        f"Discriminator model name [{which_model_netd}] is not recognized")


def get_n_parameters(params) -> int:
    """networks_other.py:196-200 on a flax params pytree."""
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
