"""Cutout / CutMix / ClassMix mixing as pure mask arithmetic.

Parity target: generate_unsup_data / generate_cutout_mask /
generate_class_mask (augment.py:230-313), re-expressed with static shapes and
vmapped per-sample PRNG. 3D variant mirrors augment_3d.py:182-226 (z-slab
extents hardcoded 10/20 in the reference for 80-deep volumes; here
proportional: depth/8 .. depth/4).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def generate_cutout_mask(rng, img_size, ratio: float = 2.0):
    """Binary mask [H, W] with a random zero rectangle of area H*W/ratio
    (augment.py:230-244)."""
    h, w = img_size
    k_w, k_x, k_y = jax.random.split(rng, 3)
    cutout_area = h * w / ratio
    # np.random.randint(w/ratio + 1, w)
    lo = int(w / ratio) + 1
    rw = jax.random.randint(k_w, (), lo, w)
    rh = jnp.round(cutout_area / rw).astype(jnp.int32)
    rh = jnp.minimum(rh, h)
    x0 = jax.random.randint(k_x, (), 0, jnp.maximum(w - rw + 1, 1))
    y0 = jax.random.randint(k_y, (), 0, jnp.maximum(h - rh + 1, 1))
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inside = ((ys >= y0) & (ys < y0 + rh) & (xs >= x0) & (xs < x0 + rw))
    return jnp.where(inside, 0.0, 1.0)


def generate_cutout_mask_3d(rng, img_size, ratio: float = 2.0):
    """3D slab cutout (augment_3d.py:182-207): 2D rectangle times a z-slab."""
    h, w, d = img_size
    k2d, k_z, k_zl = jax.random.split(rng, 3)
    mask2d = generate_cutout_mask(k2d, (h, w), ratio)
    z_lo, z_hi = max(d // 8, 1), max(d // 4, 2)
    zl = jax.random.randint(k_zl, (), z_lo, z_hi)
    z0 = jax.random.randint(k_z, (), 0, jnp.maximum(d - zl + 1, 1))
    zs = jnp.arange(d)
    z_inside = (zs >= z0) & (zs < z0 + zl)
    return jnp.where(z_inside[None, None, :], mask2d[:, :, None], 1.0)


def generate_class_mask(rng, pseudo_labels, num_classes: int):
    """Select ~half of the classes present in the label map
    (augment.py:247-252), with static shapes.

    The reference permutes the unique labels and keeps len//2. Here every
    class id gets a random score; present classes are ranked by score and the
    top floor(n_present/2) are selected.
    """
    present = jnp.zeros((num_classes,), bool).at[
        jnp.clip(pseudo_labels.reshape(-1), 0, num_classes - 1)].set(True)
    scores = jax.random.uniform(rng, (num_classes,))
    scores = jnp.where(present, scores, -1.0)
    n_present = jnp.sum(present.astype(jnp.int32))
    k = n_present // 2
    order = jnp.argsort(-scores)
    ranks = jnp.argsort(order)
    selected = present & (ranks < k)
    return selected[jnp.clip(pseudo_labels, 0, num_classes - 1)].astype(
        jnp.float32) * (pseudo_labels >= 0)


def generate_unsup_data(rng, data, target, logits, mode: str = "cutmix",
                        num_classes: int = 4):
    """Batch mixing (augment.py:284-313).

    data [B, *S, C], target [B, *S] int, logits [B, *S] float.
    cutout: zero the region, void (-1) its labels;
    cutmix/classmix: paste from the next sample (i+1) % B.
    """
    b = data.shape[0]
    spatial = data.shape[1:-1]
    keys = jax.random.split(rng, b)

    if mode == "cutout":
        if len(spatial) == 2:
            masks = jax.vmap(partial(generate_cutout_mask,
                                     img_size=spatial))(keys)
        else:
            masks = jax.vmap(partial(generate_cutout_mask_3d,
                                     img_size=spatial))(keys)
        new_target = jnp.where(masks > 0, target, -1)
        return (data * masks[..., None], new_target.astype(jnp.int32),
                logits * masks)

    if mode == "cutmix":
        if len(spatial) == 2:
            masks = jax.vmap(partial(generate_cutout_mask,
                                     img_size=spatial, ratio=2.0))(keys)
        else:
            masks = jax.vmap(partial(generate_cutout_mask_3d,
                                     img_size=spatial, ratio=2.0))(keys)
    elif mode == "classmix":
        masks = jax.vmap(partial(generate_class_mask,
                                 num_classes=num_classes))(keys, target)
    else:
        masks = jnp.ones_like(logits)

    rolled = lambda x: jnp.roll(x, -1, axis=0)   # sample (i+1) % B
    new_data = data * masks[..., None] + rolled(data) * (1 - masks[..., None])
    new_target = target * masks + rolled(target) * (1 - masks)
    new_logits = logits * masks + rolled(logits) * (1 - masks)
    return new_data, new_target.astype(jnp.int32), new_logits
