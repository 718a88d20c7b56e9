"""Stage-2 ARCO training as one jitted functional step (2D and rank-generic).

Parity target: train_arco_2d.py:139-480 per-iteration body (call stack in
SURVEY §3.2). One device program per step:

  pseudo-labels (teacher) -> device mixing aug (cutout/cutmix/classmix)
  -> photometric + AdvMorph strong aug -> 5 forwards (student l/u/tps,
  teacher l/u) -> feature fusion + representation heads -> loss composition
      k1*reco + k3*unsup + sup(CE+Dice) + k2*eqv + k4*loss_q
  -> SGD + poly LR + teacher EMA + queue/memobank updates.

TPU-native redesign notes (SURVEY §7):
- The reference's CPU PIL loop (batch_transform, augment.py:255-281) and
  np.percentile host sync (train_arco_2d.py:359-371) are replaced by vmapped
  device augs and a masked device percentile — the step never leaves the
  device.
- The reference runs a 6th forward on color-jittered labeled images whose
  features are computed then never used (l_feature_map_2,
  train_arco_2d.py:311,319,326 — dead compute); it is dropped.
- The random pool (train_arco_2d.py:156-159: K x 496*H*W ~ 4.7 GB in fp32) is
  stored bf16; distances accumulate in fp32.
- All queues/banks are explicit state; everything is resumable from a single
  checkpointed pytree (the reference silently drops them, SURVEY §5).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from arco_tpu.augment.mixing import generate_unsup_data
from arco_tpu.augment.morph import adv_morph_batch
from arco_tpu.augment.photometric import batch_photometric
from arco_tpu.augment.tps import RandTPS
from arco_tpu.losses.consistency import (compute_unsupervised_loss,
                                         equivariance_loss, revisiting_loss)
from arco_tpu.losses.contrastive import (MemoBank,
                                         compute_contra_memobank_loss,
                                         create_memobank, descending_rank)
from arco_tpu.losses.supervised import cross_entropy, dice_loss, one_hot
from arco_tpu.models.heads import FeatureExtractor, QRepresentation
from arco_tpu.ops import normalize
from arco_tpu.ops.interpolate import resize_nearest
from arco_tpu.ops.ring_buffer import enqueue_fixed
from arco_tpu.utils.tree import ema_update


class ArcoModules(NamedTuple):
    model: Any
    feature_extractor: Any
    q_representation: Any
    tps: RandTPS


class ArcoState(NamedTuple):
    params: Any              # {model, feature_extractor, q_representation}
    batch_stats: Any         # {model}
    ema_params: Any          # {model}
    ema_batch_stats: Any     # {model}
    k_feature_params: Any    # teacher feature extractor (EMA of student's)
    memobank: MemoBank
    random_pool: jnp.ndarray     # [K, F_pool] rows L2-normalized
    random_pool_ptr: jnp.ndarray
    opt_state: Any
    rng: jnp.ndarray
    step: jnp.ndarray


def masked_percentiles(values, mask, pcts):
    """np.percentile(values[mask], pct) for several pcts with ONE device sort
    (replaces the host sync at train_arco_2d.py:359-371)."""
    flat = values.reshape(-1).astype(jnp.float32)
    m = mask.reshape(-1)
    big = jnp.where(m, flat, jnp.inf)
    sorted_vals = jnp.sort(big)
    n = jnp.sum(m.astype(jnp.int32))
    size = sorted_vals.shape[0]
    outs = []
    for pct in pcts:
        rank = pct / 100.0 * jnp.maximum(n - 1, 0).astype(jnp.float32)
        lo = jnp.floor(rank).astype(jnp.int32)
        hi = jnp.ceil(rank).astype(jnp.int32)
        v_lo = sorted_vals[jnp.clip(lo, 0, size - 1)]
        v_hi = sorted_vals[jnp.clip(hi, 0, size - 1)]
        out = v_lo + (v_hi - v_lo) * (rank - lo)
        outs.append(jnp.where(n > 0, out, 0.0))
    return outs


def masked_percentile(values, mask, pct):
    return masked_percentiles(values, mask, [pct])[0]


def masked_percentiles_histogram(values, mask, pcts, bins: int = 2048,
                                 lo: float = 0.0, hi: float = None):
    """O(n) approximate masked percentiles via a fixed-range histogram —
    replaces the device sort when `ArcoConfig.fast_percentile` is set.

    For entropies the range is [0, log K]; with 2048 bins the threshold
    quantization is < 0.07% of the range, far below the pixel-membership
    noise of the entropy split."""
    flat = values.reshape(-1).astype(jnp.float32)
    m = mask.reshape(-1).astype(jnp.float32)
    hi = hi if hi is not None else jnp.max(flat * m) + 1e-6
    # all-false mask -> hi == lo == 0 would give 0/0 below; any positive
    # range works since the result is ignored when n == 0
    hi = jnp.maximum(hi, lo + 1e-6)
    idx = jnp.clip(((flat - lo) / (hi - lo) * bins).astype(jnp.int32),
                   0, bins - 1)
    hist = jnp.zeros((bins,), jnp.float32).at[idx].add(m)
    cdf = jnp.cumsum(hist)
    n = cdf[-1]
    edges = lo + (jnp.arange(bins, dtype=jnp.float32) + 1.0) \
        / bins * (hi - lo)
    outs = []
    for pct in pcts:
        target = pct / 100.0 * n
        b = jnp.searchsorted(cdf, target)
        out = edges[jnp.clip(b, 0, bins - 1)]
        outs.append(jnp.where(n > 0, out, 0.0))  # match sort-based n=0 case
    return outs


def make_arco_modules(model, width: int, height: int, batch_size: int,
                      feature_channels=(256, 128, 64, 32, 16),
                      fused_dim=None, tps_sigma: float = 0.01,
                      dtype=jnp.float32, total_batch: int = None):
    """2D: fea_dim [256,128,64,32,16] -> 496 (train_arco_2d.py:231-242);
    3D: fea_dim [128,64,32,16,16] -> fused_dim 16 (train_arco_3d.py:208-216).

    ``total_batch`` is b_labeled + b_unlabeled (the TPS warp acts on the
    concatenated batch); defaults to 2*batch_size for equal streams.
    """
    fused = int(fused_dim) if fused_dim else int(sum(feature_channels))
    total = total_batch if total_batch is not None else batch_size * 2
    return ArcoModules(
        model=model,
        feature_extractor=FeatureExtractor(fea_dim=tuple(feature_channels),
                                           output_dim=fused, dtype=dtype),
        q_representation=QRepresentation(channels=fused, dtype=dtype),
        tps=RandTPS(width, height, batch_size=total,
                    sigma=tps_sigma, random_scale=(0.8, 1.2), mode="affine"))


def init_arco_state(rng, modules: ArcoModules, cfg, input_shape, tx,
                    model_params=None, model_batch_stats=None,
                    pool_dtype=jnp.bfloat16) -> ArcoState:
    """input_shape: [B, *spatial, C_in]. model_params may come from a stage-1
    checkpoint (the reference loads iter_30000.pth into student AND teacher,
    train_arco_2d.py:223-226).

    The whole build is one jitted program: eager init dispatches thousands
    of individual ops, which costs ~10 minutes on the tunneled TPU backend
    (~0.7 ms per dispatch); jitted it is one compile + one execution."""
    build = jax.jit(functools.partial(
        _build_arco_state, modules=modules, cfg=cfg,
        input_shape=tuple(input_shape), tx=tx, pool_dtype=pool_dtype))
    # None must stay None (BN models fall back to freshly-initialized
    # batch stats inside); an explicit {} means "model has no stats"
    return build(rng, model_params, model_batch_stats)


def _build_arco_state(rng, model_params, model_batch_stats, *, modules,
                      cfg, input_shape, tx, pool_dtype) -> ArcoState:
    k_model, k_fe, k_qr, k_pool, k_state = jax.random.split(rng, 5)
    dummy = jnp.zeros(input_shape, jnp.float32)
    mvars = modules.model.init({"params": k_model,
                                "dropout": jax.random.PRNGKey(0)},
                               dummy, train=True)
    params_model = model_params if model_params is not None else mvars["params"]
    bs_model = model_batch_stats if model_batch_stats is not None \
        else mvars.get("batch_stats", {})

    _, _, fmap = modules.model.apply(
        {"params": params_model, "batch_stats": bs_model}, dummy, train=False,
        rngs={"dropout": jax.random.PRNGKey(0)})
    fe_vars = modules.feature_extractor.init(k_fe, fmap)
    fused = modules.feature_extractor.apply(fe_vars, fmap)
    qr_vars = modules.q_representation.init(k_qr, fused)

    params = {"model": params_model,
              "feature_extractor": fe_vars["params"],
              "q_representation": qr_vars["params"]}
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)

    # pool rows live in the representation's NATIVE shape: flattening to
    # [K, 32M] forces multi-GB relayouts on TPU (see losses/consistency.py)
    pool_row_shape = tuple(int(d) for d in fused.shape[1:])
    pool = jax.random.normal(k_pool, (cfg.K,) + pool_row_shape, jnp.float32)
    pool = normalize.l2_normalize(pool, normalize.feature_axes(pool))

    k_bank = jax.random.fold_in(k_pool, 1)
    memobank = create_memobank(
        num_classes=_num_classes_of(modules.model), feat=fused.shape[-1],
        capacity=cfg.memobank_size, capacity_bg=cfg.memobank_size_bg,
        dtype=fused.dtype, init=getattr(cfg, "memobank_init", "zeros"),
        init_key=k_bank)

    return ArcoState(
        params=params, batch_stats={"model": bs_model},
        ema_params={"model": copy(params_model)},
        ema_batch_stats={"model": copy(bs_model)},
        k_feature_params=copy(fe_vars["params"]),
        memobank=memobank, random_pool=pool.astype(pool_dtype),
        random_pool_ptr=jnp.array(0, jnp.int32),
        opt_state=tx.init(params), rng=k_state,
        step=jnp.array(0, jnp.int32))


def _num_classes_of(model):
    for attr in ("class_num", "n_classes", "num_classes"):
        if hasattr(model, attr):
            return int(getattr(model, attr))
    raise AttributeError("model has no class-count attribute")


def _apply_model(model, params, batch_stats, x, rng, stop_grad=False,
                 remat=False):
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats

    def fwd(variables, x):
        return model.apply(variables, x, train=True, rngs={"dropout": rng},
                           mutable=["batch_stats"])

    if remat and not stop_grad:
        # recompute activations in the backward pass (SURVEY §7.3 #4);
        # teacher forwards carry no grad so remat would only add FLOPs
        fwd = jax.checkpoint(fwd)
    (logits, latent, fmap), mutated = fwd(variables, x)
    if stop_grad:
        logits, latent, fmap = jax.tree_util.tree_map(
            jax.lax.stop_gradient, (logits, latent, fmap))
    return logits, fmap, mutated.get("batch_stats", {})


def arco_loss_fn(params, state: ArcoState, modules: ArcoModules, cfg, batch,
                 aug, rng, num_classes, max_iterations):
    """Differentiable step body; returns (loss, aux).

    ``aug`` carries the pre-computed (non-differentiable) augmented tensors
    and teacher outputs so the grad graph holds only student compute.
    """
    k_l, k_dead, k_u, k_tps = jax.random.split(rng, 4)
    image_l, label_l = batch["image_l"], batch["label_l"]
    u_aug_data = aug["u_aug_data"]
    u_aug_label = aug["u_aug_label"]
    u_aug_logits = aug["u_aug_logits"]

    # --- student forwards (BN stats threaded in forward order) ----------
    bs = state.batch_stats["model"]
    pred_l, l_fmap, bs = _apply_model(modules.model, params["model"], bs,
                                      image_l, k_l, remat=cfg.remat)
    if getattr(cfg, "dead_forward", False):
        # the reference's 2nd student forward (train_arco_2d.py:311,
        # model(images_cj2_l)): its OUTPUTS are dead, but in train mode it
        # advances BatchNorm running statistics with an extra labeled-image
        # pass — which eval (running stats) sees. Kept gradient-free
        # (gradients never flowed in the reference either).
        _, _, bs = _apply_model(modules.model, params["model"], bs,
                                aug["images_cj2_l"], k_dead, stop_grad=True)
    pred_u, u_fmap, bs = _apply_model(modules.model, params["model"], bs,
                                      u_aug_data, k_u, remat=cfg.remat)

    fe = lambda p, f: modules.feature_extractor.apply({"params": p}, f)
    qr = lambda p, f: modules.q_representation.apply({"params": p}, f)
    # the fusion heads are pure convs (no batch norm), so fusing the
    # labeled/unlabeled sub-batches into ONE application is exact and
    # halves the head overhead (better MXU occupancy at 2B than B)
    fmap_cat = [jnp.concatenate([a, b], axis=0)
                for a, b in zip(l_fmap, u_fmap)]
    feat_all = fe(params["feature_extractor"], fmap_cat)
    rep_all = qr(params["q_representation"], feat_all)
    b_l_ = pred_l.shape[0]
    rep_u = rep_all[b_l_:]
    pred_all = jnp.concatenate([pred_l, pred_u], axis=0)

    # --- losses ----------------------------------------------------------
    if cfg.compute_revisit:
        loss_q = revisiting_loss(state.random_pool, rep_u,
                                 aug["rep_u_teacher"], topk=cfg.topk)
    else:
        loss_q = jnp.array(0.0, jnp.float32)

    probs_l = jax.nn.softmax(pred_l.astype(jnp.float32), axis=-1)
    loss_ce = cross_entropy(pred_l, label_l)
    loss_dice = dice_loss(probs_l, label_l, num_classes)
    supervised = loss_ce + loss_dice

    if cfg.compute_unsup:
        unsup = compute_unsupervised_loss(
            pred_u, u_aug_label, u_aug_logits, cfg.strong_threshold,
            conf_mask=getattr(cfg, "unsup_conf_mask", False))
    else:
        unsup = jnp.array(0.0, jnp.float32)

    # --- entropy split + contrastive (no grad, train_arco_2d.py:344-398) --
    if cfg.compute_contrastive:
        valid_u = u_aug_label >= 0
        if cfg.use_entropy_split:
            prob_u_stu = jax.lax.stop_gradient(
                jax.nn.softmax(pred_u.astype(jnp.float32), axis=-1))
            entropy = -jnp.sum(prob_u_stu * jnp.log(prob_u_stu + 1e-10),
                               axis=-1)
            alpha_t = 20.0 * (1.0 - state.step.astype(jnp.float32)
                              / max_iterations)
            pct_fn = (masked_percentiles_histogram if cfg.fast_percentile
                      else masked_percentiles)
            low_thresh, high_thresh = pct_fn(
                entropy, valid_u, [alpha_t, 100.0 - alpha_t])
            low_entropy_mask = (entropy <= low_thresh) & valid_u
            high_entropy_mask = (entropy >= high_thresh) & valid_u
        else:
            low_entropy_mask = valid_u
            high_entropy_mask = valid_u

        ones_l = jnp.ones(label_l.shape, bool)
        low_mask_all = jnp.concatenate([ones_l, low_entropy_mask], axis=0)
        high_mask_all = jnp.concatenate([ones_l, high_entropy_mask], axis=0)

        spatial = rep_all.shape[1:-1]
        def to_rep_size(x):
            if x.shape[1:-1] != spatial:
                return resize_nearest(x, spatial)
            return x
        onehot_l = one_hot(label_l, num_classes)
        onehot_u = one_hot(u_aug_label, num_classes)
        label_all = jnp.concatenate(
            [to_rep_size(onehot_l), to_rep_size(onehot_u)], axis=0)
        label_l_padded = jnp.concatenate(
            [to_rep_size(onehot_l), jnp.zeros_like(to_rep_size(onehot_u))],
            axis=0)

        prob_teacher_all = jnp.concatenate(
            [aug["prob_l_teacher"], aug["prob_u_teacher"]], axis=0)
        # backbones whose representation is sub-resolution (DeepLab at 1/8)
        # need the teacher probabilities at rep size too — the reference
        # only ever ran full-res reps, so it interpolates labels/masks but
        # not probs (train_arco_2d.py:376-393); nearest keeps each pixel a
        # valid distribution
        prob_teacher_all = to_rep_size(prob_teacher_all)
        rank_all = descending_rank(prob_teacher_all)
        b_l = image_l.shape[0]
        is_labeled = jnp.concatenate([jnp.ones((b_l,), bool),
                                      jnp.zeros((u_aug_data.shape[0],),
                                                bool)])
        rep_teacher_all = jnp.concatenate(
            [aug["rep_l_teacher"], aug["rep_u_teacher"]], axis=0)

        if getattr(cfg, "infonce_impl", "xla") == "pallas":
            from arco_tpu.ops.pallas.infonce import make_infonce_fn
            # interpret mode keeps the kernel runnable in CPU tests/dryruns
            # bank_normalized: this trainer's banks store keys L2-normalized
            # at enqueue time, so the kernel streams them as stored (bf16
            # under mixed precision) with no per-step renormalize pass
            infonce_fn = make_infonce_fn(
                use_pallas=True, tile=cfg.pallas_tile,
                interpret=jax.default_backend() != "tpu",
                bank_normalized=True)
        else:
            infonce_fn = None
        new_bank, reco = compute_contra_memobank_loss(
            aug["rng_contrastive"], rep_all, label_all, prob_teacher_all,
            rank_all, is_labeled, label_l_padded,
            to_rep_size(low_mask_all[..., None].astype(jnp.float32))[..., 0],
            to_rep_size(high_mask_all[..., None].astype(jnp.float32))[..., 0],
            rep_teacher_all, state.memobank,
            delta_n=cfg.strong_threshold_u2pl, func=cfg.func,
            num_queries=cfg.num_queries, num_negatives=cfg.num_negatives,
            temp=cfg.temp, low_rank=cfg.low_rank, high_rank=cfg.high_rank,
            current_class_threshold=cfg.current_class_threshold,
            enqueue_per_class=cfg.memobank_enqueue,
            infonce_fn=infonce_fn)
    else:
        new_bank, reco = state.memobank, jnp.array(0.0, jnp.float32)

    # --- equivariance (train_arco_2d.py:404-423; the 3D trainer computes it
    # for logging but excludes it from the total, train_arco_3d.py:390-391) --
    if cfg.compute_eqv:
        labels_cat = jnp.concatenate([label_l, u_aug_label], axis=0)
        logits_cat = jnp.concatenate(
            [jnp.ones(label_l.shape, jnp.float32), u_aug_logits], axis=0)
        mask = jnp.ones(labels_cat.shape, jnp.float32)
        mask = jnp.where(labels_cat == 0, 0.0, mask)
        mask = jnp.where(logits_cat < cfg.weak_threshold, 0.0, mask)[..., None]
        images_cj2 = jnp.concatenate(
            [aug["images_cj2_l"], aug["images_cj2_u"]], axis=0)
        grid = modules.tps.reset(aug["rng_tps"])
        # one fused warp: images, mask, and detached predictions share the
        # grid and zeros padding, so a single channel-stacked grid_sample
        # does the work of three (gather cost scales with rows, not
        # channels); nothing here carries grad, so the gather has no
        # backward pass either.
        c_img = images_cj2.shape[-1]
        stacked = jax.lax.stop_gradient(jnp.concatenate(
            [images_cj2, mask, pred_all], axis=-1))
        warped = modules.tps.apply(stacked, grid, padding_mode="zeros")
        images_tps = warped[..., :c_img]
        mask_tps = warped[..., c_img:c_img + 1]
        pred_tps_org = warped[..., c_img + 1:]
        # when the eqv term is excluded from the total (the 3D reference
        # computes it for logging only, train_arco_3d.py:390-391) its
        # forward contributes nothing to the gradients — stop_grad frees
        # the backward activations of this 6th full-volume forward, which
        # is the difference between fitting in 16 GB HBM and OOM at the
        # [112,112,80] V-Net patch
        pred_tps, _, bs = _apply_model(modules.model, params["model"], bs,
                                       images_tps, k_tps,
                                       stop_grad=not cfg.use_eqv_loss,
                                       remat=cfg.remat)
        loss_eqv = equivariance_loss(pred_tps, pred_tps_org, mask_tps)
    else:
        loss_eqv = jnp.array(0.0, jnp.float32)

    loss = (cfg.k1 * reco + cfg.k3 * unsup + supervised
            + (cfg.k2 * loss_eqv if cfg.use_eqv_loss else 0.0)
            + cfg.k4 * loss_q)

    aux_out = {
        "new_batch_stats": {"model": bs}, "new_memobank": new_bank,
        "rep_u_teacher": aug["rep_u_teacher"],
        "metrics": {"loss": loss, "reco_loss": reco, "loss_q": loss_q,
                    "unsup_loss": unsup, "loss_ce": loss_ce,
                    "loss_dice": loss_dice, "loss_eqv": loss_eqv,
                    # student labeled prediction for the TB train/Prediction
                    # grid (train_arco_2d.py:446-450); popped by the CLI
                    # before scalar logging
                    "pred_l_label": jnp.argmax(pred_l, axis=-1)
                    .astype(jnp.int32)}}
    return loss, aux_out


def make_arco_step(modules: ArcoModules, cfg, tx, num_classes: int,
                   max_iterations: int, output_size=None):
    """Returns jitted step(state, batch) -> (state, metrics).

    batch: image_l [B,*S,C], label_l [B,*S], image_u [B,*S,C].
    """

    def step_fn(state: ArcoState, batch):
        rng, k_pseudo, k_mix, k_cj_u1, k_cj_u2, k_morph1, k_morph2, \
            k_tps, k_contra, k_loss, k_tl, k_tu = jax.random.split(state.rng, 12)

        # teacher EMA of the feature extractor BEFORE forwards
        # (train_arco_2d.py:306-308, momentum 0.99)
        k_feature_params = ema_update(state.k_feature_params,
                                      state.params["feature_extractor"], 0.99)

        # ---- pseudo-labels (teacher, no grad; train_arco_2d.py:284-286) --
        ebs = state.ema_batch_stats["model"]
        pred_u_t0, _, ebs = _apply_model(
            modules.model, state.ema_params["model"], ebs, batch["image_u"],
            k_pseudo, stop_grad=True)
        probs = jax.nn.softmax(pred_u_t0.astype(jnp.float32), axis=-1)
        pseudo_logits = jnp.max(probs, axis=-1)
        pseudo_labels = jnp.argmax(probs, axis=-1).astype(jnp.int32)

        # ---- device augmentation (train_arco_2d.py:287-304) --------------
        u_img = batch["image_u"]
        if output_size is not None and u_img.shape[1:-1] != tuple(output_size):
            u_img = resize_nearest(u_img, output_size)
            pseudo_labels = resize_nearest(
                pseudo_labels[..., None], output_size)[..., 0]
            pseudo_logits = resize_nearest(
                pseudo_logits[..., None], output_size)[..., 0]
        u_aug_data, u_aug_label, u_aug_logits = generate_unsup_data(
            k_mix, u_img, pseudo_labels, pseudo_logits, mode=cfg.apply_aug,
            num_classes=num_classes)

        # strong aug; the 3D reference's batch_transform is a passthrough
        # (augment_3d.py:209-226) so both flags are off on the 3D path
        images_cj2_u = u_aug_data
        u_aug_strong = u_aug_data
        if cfg.use_photometric:
            images_cj2_u = batch_photometric(k_cj_u1, images_cj2_u)
            u_aug_strong = batch_photometric(k_cj_u2, u_aug_strong)
        if cfg.use_adv_morph:
            coarse = getattr(cfg, "morph_coarse_exp", True)
            images_cj2_u = adv_morph_batch(k_morph1, images_cj2_u,
                                           coarse_exp=coarse)
            u_aug_strong = adv_morph_batch(k_morph2, u_aug_strong,
                                           coarse_exp=coarse)

        images_cj2_l = batch["image_l"]
        if getattr(cfg, "quantize_augs", False):
            # replicate the reference's PIL round-trip quantization
            # (augment.py:255-281): every augmented image and the ridden
            # confidence map are floor-quantized to 1/255 (torchvision
            # to_pil_image: pic.mul(255).byte()); the labeled cj2 copy went
            # through batch_transform(apply_augmentation=False) and is
            # quantized too, while the raw labeled forward input is not
            q8 = lambda x: jnp.floor(jnp.clip(x, 0.0, 1.0) * 255.0) / 255.0
            u_aug_strong = q8(u_aug_strong)
            images_cj2_u = q8(images_cj2_u)
            u_aug_logits = q8(u_aug_logits)
            images_cj2_l = q8(images_cj2_l)

        # ---- teacher forwards + fusion (no grad) --------------------------
        pred_l_t, l_fmap_t, ebs = _apply_model(
            modules.model, state.ema_params["model"], ebs, batch["image_l"],
            k_tl, stop_grad=True)
        pred_u_t, u_fmap_t, ebs = _apply_model(
            modules.model, state.ema_params["model"], ebs, u_aug_strong,
            k_tu, stop_grad=True)
        kfe = lambda f: modules.feature_extractor.apply(
            {"params": k_feature_params}, f)
        # one fused teacher head application (convs only — exact)
        fmap_t_cat = [jnp.concatenate([a, b], axis=0)
                      for a, b in zip(l_fmap_t, u_fmap_t)]
        rep_t_all = jax.lax.stop_gradient(kfe(fmap_t_cat))
        b_tl = batch["image_l"].shape[0]
        rep_l_teacher = rep_t_all[:b_tl]
        rep_u_teacher = rep_t_all[b_tl:]

        aug = {"u_aug_data": u_aug_strong, "u_aug_label": u_aug_label,
               "u_aug_logits": u_aug_logits,
               "images_cj2_l": images_cj2_l, "images_cj2_u": images_cj2_u,
               "prob_l_teacher": jax.nn.softmax(
                   pred_l_t.astype(jnp.float32), axis=-1),
               "prob_u_teacher": jax.nn.softmax(
                   pred_u_t.astype(jnp.float32), axis=-1),
               "rep_l_teacher": rep_l_teacher, "rep_u_teacher": rep_u_teacher,
               "rng_tps": k_tps, "rng_contrastive": k_contra}

        (loss, aux), grads = jax.value_and_grad(arco_loss_fn, has_aux=True)(
            state.params, state, modules, cfg, batch, aug, k_loss,
            num_classes, max_iterations)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        # teacher model EMA (isd._momentum_update_key_encoder,
        # train_arco_2d.py:432, m=0.99)
        ema_params = {"model": ema_update(state.ema_params["model"],
                                          params["model"], 0.99)}

        # random-pool enqueue (train_arco_2d.py:400-402); keys stay in the
        # rep's native shape — normalized over the feature axes.
        #
        # The optimization_barrier orders the enqueue AFTER the
        # revisiting-loss read of the pool (loss_q is derived from that
        # read; with the stop_gradient in revisiting_loss its backward
        # provably never touches the pool, so the scalar is the complete
        # read fence). Measured on chip at 2D 256² bs 4+4
        # (docs/artifacts/hbm): without the fence XLA inserts two extra
        # full-pool copies (+9.4 GB, 190.3 ms/step); with it 175.8 ms.
        # A separate donated enqueue dispatch (fully in-place DUS) was
        # also measured and is NOT faster end-to-end here — the second
        # dispatch's latency gap on the tunneled backend eats the saving
        # (177.0 ms) — so the fenced in-step form stays.
        keys = normalize.l2_normalize(
            rep_u_teacher.astype(jnp.float32),
            normalize.feature_axes(rep_u_teacher))
        pool_in, _ = jax.lax.optimization_barrier(
            (state.random_pool, aux["metrics"]["loss_q"]))
        pool, pool_ptr = enqueue_fixed(pool_in,
                                       state.random_pool_ptr, keys)

        new_state = state._replace(
            params=params, batch_stats=aux["new_batch_stats"],
            ema_params=ema_params, ema_batch_stats={"model": ebs},
            k_feature_params=k_feature_params, memobank=aux["new_memobank"],
            random_pool=pool, random_pool_ptr=pool_ptr, opt_state=opt_state,
            rng=rng, step=state.step + 1)
        return new_state, aux["metrics"]

    return jax.jit(step_fn, donate_argnums=(0,))
