"""Encoder/decoder freeze surface (``--train_encoder`` / ``--train_decoder``).

Reference parity: pretrain_2D.py:71-72 / pretrain_3D.py:73-74 expose the
flags; unetWithArgs.py:326-343 freezes the corresponding half of the backbone
with ``requires_grad=False``; pretrain_2D.py:249 (pretrain_3D.py:225)
switches the loss to ``k1*loss_latent`` when training the encoder only; and
the snapshot directory gets a ``_train_encoder`` / ``_train_decoder`` suffix
instead of ``final`` (pretrain_2D.py:313-320).

TPU-native translation: flax parameters are immutable function inputs, so
"requires_grad=False" becomes an *optimizer* property — the param tree is
labeled {train, freeze} and ``optax.multi_transform`` routes frozen leaves to
``set_to_zero()``.  A step then leaves frozen leaves bit-identical (no decay,
no momentum), exactly like torch's detached parameters.  Gradients for the
frozen half are still computed by ``value_and_grad`` and discarded; XLA's
dead-code elimination prunes most of that backward work at compile time.
"""

from __future__ import annotations

import optax


def snapshot_suffix(train_encoder: bool = True,
                    train_decoder: bool = True) -> str:
    """Snapshot-dir suffix encoding the freeze configuration
    (pretrain_2D.py:313-320).  Both frozen is 'neither trains': the
    reference crashes there (``suffix`` is never assigned); we return an
    explicit marker instead."""
    if train_encoder and train_decoder:
        return "final"
    if train_encoder:
        return "_train_encoder"
    if train_decoder:
        return "_train_decoder"
    return "_frozen"


def _part_of(name: str) -> str:
    """Classify a top-level flax submodule name as encoder or decoder.

    Covers the two backbones the reference's freeze flags reach: the 2D
    U-Net (net_factory_args.py:14-17 forwards the flags only for 'unet')
    and the 3D V-Net (model_3D.py:103-106).  The V-Net is @nn.compact, so
    the split is positional: VNetConvBlock_0..4 + DownBlock_* make up the
    encoder (vnetWithArgs.py:180-201), everything after is decoder.
    """
    if name.startswith(("Encoder",)):
        return "encoder"
    if name.startswith(("Decoder", "aux_decoder", "out_conv")):
        return "decoder"
    if name.startswith("DownBlock"):
        return "encoder"
    if name.startswith(("UpBlock", "Conv_")):
        return "decoder"
    if name.startswith("VNetConvBlock"):
        idx = int(name.rsplit("_", 1)[-1])
        return "encoder" if idx <= 4 else "decoder"
    raise ValueError(
        f"cannot classify submodule {name!r} as encoder/decoder; "
        "--train_encoder/--train_decoder support the unet/vnet backbones "
        "(the same set the reference's flags reach)")


def model_param_labels(model_params, train_encoder: bool,
                       train_decoder: bool):
    """Label every leaf of the MODEL param subtree 'train' or 'freeze'."""
    import jax

    def label_subtree(part_trainable, subtree):
        lab = "train" if part_trainable else "freeze"
        return jax.tree_util.tree_map(lambda _: lab, subtree)

    out = {}
    for name, subtree in model_params.items():
        part = _part_of(name)
        trainable = train_encoder if part == "encoder" else train_decoder
        out[name] = label_subtree(trainable, subtree)
    return out


def apply_freeze(tx, params, train_encoder: bool, train_decoder: bool):
    """Wrap optimizer ``tx`` so the frozen halves of ``params['model']``
    receive exactly-zero updates.  No-op when both halves train."""
    if train_encoder and train_decoder:
        return tx
    import jax

    labels = {
        k: (model_param_labels(v, train_encoder, train_decoder)
            if k == "model"
            else jax.tree_util.tree_map(lambda _: "train", v))
        for k, v in params.items()}
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels)


def apply_deeplab_bn_freeze(tx, params):
    """Wrap optimizer ``tx`` so every BatchNorm scale/bias in the DeepLab-v2
    trunk receives exactly-zero updates — the reference sets
    requires_grad=False on every trunk BN (models/deeplab.py:90-103,
    155-157, 176-180), so its optimizer never touches them
    (get_1x_lr_params_NOscale, deeplab.py:219-236)."""
    import jax

    def label(path, _):
        names = [getattr(p, "key", "") for p in path]
        in_model = names and names[0] == "model"
        is_bn = any(str(n).startswith("BatchNorm") for n in names)
        return "freeze" if (in_model and is_bn) else "train"

    labels = jax.tree_util.tree_map_with_path(label, params)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels)
