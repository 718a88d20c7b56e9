"""Stage-1 ISD pretraining as one jitted functional step.

Parity target: pretrain_2D.py:146-300 + the ISD wrapper (model_2D.py:115-311):
momentum-teacher self-distillation with two MoCo-style queues — a latent
queue [K, latent_feature_size] and a patch-descriptor queue
[K, P, C*pool^2] — trained with CE+Dice on the labeled sub-batch plus KLD
between student and teacher similarity logits at temperatures (Ts, Tt).

TPU-native redesign notes:
- All reference side effects (EMA inside forward at model_2D.py:243, ring
  buffers at :306-307) are pure state transitions in PretrainState.
- ShuffleBN (model_2D.py:246-253) exists to decorrelate per-GPU BatchNorm
  statistics under DataParallel; a single jitted program computes BN over the
  full (global) batch, which is invariant to sample order, so the shuffle is
  dropped as a no-op. The reference's pre-update teacher forward whose output
  is returned but never used in the loss (ema_output_tmp, model_2D.py:233-238,
  pretrain_2D.py:229-252) is also dropped.
- The 49-patch Python head loop (model_2D.py:265-268) becomes one
  extract-patches reshape with the heads applied to a folded [B*P] batch.
- The reference's cat/reshape sequence at model_2D.py:270-296 scrambles
  batch/patch/channel coordinates through raw memory reinterpretation; this
  rebuild implements the stated intent with clean axes: per-patch descriptors
  [B, P, F] as queries against the teacher-descriptor queue flattened to
  [K*P, F] keys, cosine similarities / temperature.
- 3D (pretrain_3D.py + model_3D.py ISD_3d) shares this implementation: the
  backbone, heads and patch extractor are rank-generic.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from arco_tpu.losses.supervised import (cross_entropy, dice_loss,
                                        kld_batchmean)
from arco_tpu.models.heads import (LatentMLP, LatentPredictor,
                                   OutputsPredictor, ProjectionHead)
from arco_tpu.ops.patches import pooled_patch_grid
from arco_tpu.ops.ring_buffer import enqueue_fixed
from arco_tpu.train.schedule import make_optimizer
from arco_tpu.utils.tree import ema_update


class ISDModules(NamedTuple):
    """Static module definitions shared by student and teacher."""
    model: Any
    latent_head: Any
    latent_predictor: Any
    outputs_head: Any
    outputs_predictor: Any


def make_isd_modules(model, num_classes: int, latent_feature_size: int = 512,
                     latent_pooling_size: int = 1,
                     output_pooling_size: int = 8, latent_channels: int = 256,
                     dtype=jnp.float32) -> ISDModules:
    return ISDModules(
        model=model,
        latent_head=LatentMLP(input_channels=latent_channels,
                              num_class=latent_feature_size,
                              pooling_size=latent_pooling_size, dtype=dtype),
        latent_predictor=LatentPredictor(feature_size=latent_feature_size,
                                         dtype=dtype),
        outputs_head=ProjectionHead(proj_dim=num_classes,
                                    output_pooling_size=output_pooling_size,
                                    dtype=dtype),
        outputs_predictor=OutputsPredictor(num_classes=num_classes,
                                           dtype=dtype),
    )


class PretrainState(NamedTuple):
    params: Any            # student: model + q heads + predictors
    batch_stats: Any
    ema_params: Any        # teacher: model + k heads
    ema_batch_stats: Any
    queue: jnp.ndarray     # [K, latent_feature_size]
    queue_ptr: jnp.ndarray
    queue_mask: jnp.ndarray  # [K, P, F]
    mask_queue_ptr: jnp.ndarray
    opt_state: Any
    rng: jnp.ndarray
    step: jnp.ndarray


def _num_patches(spatial, patch: int, step: int) -> int:
    import numpy as np
    return int(np.prod([len(range(0, s - patch + 1, step)) for s in spatial]))


def init_pretrain_state(rng, modules: ISDModules, cfg, input_shape,
                        max_iterations: int) -> PretrainState:
    """input_shape: [B, *spatial, C_in].

    Jitted as one program: eager init pays per-op dispatch latency, which
    is ~10 minutes on the tunneled TPU backend (see train/arco2d.py)."""
    build = jax.jit(functools.partial(
        _build_pretrain_state, modules=modules, cfg=cfg,
        input_shape=tuple(input_shape), max_iterations=max_iterations))
    return build(rng)


def _build_pretrain_state(rng, *, modules, cfg, input_shape,
                          max_iterations) -> PretrainState:
    k_model, k_heads, k_q1, k_q2, k_state = jax.random.split(rng, 5)
    dummy = jnp.zeros(input_shape, jnp.float32)
    rngs = {"params": k_model, "dropout": jax.random.PRNGKey(0)}
    mvars = modules.model.init(rngs, dummy, train=True)
    logits, latent, _ = modules.model.apply(
        mvars, dummy, train=False,
        rngs={"dropout": jax.random.PRNGKey(0)})

    patch = cfg.patch_size
    step = patch // 2
    spatial = logits.shape[1:-1]
    num_classes = logits.shape[-1]
    p = _num_patches(spatial, patch, step)
    f = num_classes * cfg.output_pooling_size ** len(spatial)

    patch_shape = (1,) + (patch,) * len(spatial) + (num_classes,)
    dummy_patch = jnp.zeros(patch_shape, jnp.float32)
    lh = modules.latent_head.init(k_heads, latent[:1])
    lat = modules.latent_head.apply(lh, latent[:1])
    lp = modules.latent_predictor.init(k_heads, lat)
    oh = modules.outputs_head.init(k_heads, dummy_patch)
    proj = modules.outputs_head.apply(oh, dummy_patch)
    op = modules.outputs_predictor.init(k_heads, proj)

    params = {"model": mvars["params"], "latent_head": lh["params"],
              "latent_predictor": lp["params"], "outputs_head": oh["params"],
              "outputs_predictor": op["params"]}
    batch_stats = {"model": mvars.get("batch_stats", {})}
    # teacher starts as a copy (model_2D.py:163-166)
    ema_params = {"model": jax.tree_util.tree_map(jnp.copy, mvars["params"]),
                  "latent_head": jax.tree_util.tree_map(jnp.copy,
                                                        lh["params"]),
                  "outputs_head": jax.tree_util.tree_map(jnp.copy,
                                                         oh["params"])}
    ema_batch_stats = {"model": jax.tree_util.tree_map(
        jnp.copy, mvars.get("batch_stats", {}))}

    # queues: randn normalized along dim 0 (model_2D.py:163-172)
    queue = jax.random.normal(k_q1, (cfg.K, cfg.latent_feature_size))
    queue = queue / (jnp.linalg.norm(queue, axis=0, keepdims=True) + 1e-12)
    queue_mask = jax.random.normal(k_q2, (cfg.K, p, f))
    queue_mask = queue_mask / (jnp.linalg.norm(queue_mask, axis=0,
                                               keepdims=True) + 1e-12)

    tx = make_optimizer(base_lr=0.01, max_iterations=max_iterations)
    opt_state = tx.init(params)
    return PretrainState(
        params=params, batch_stats=batch_stats, ema_params=ema_params,
        ema_batch_stats=ema_batch_stats, queue=queue,
        queue_ptr=jnp.array(0, jnp.int32), queue_mask=queue_mask,
        mask_queue_ptr=jnp.array(0, jnp.int32), opt_state=opt_state,
        rng=k_state, step=jnp.array(0, jnp.int32))


def _patch_descriptors(modules: ISDModules, head_params, logits,
                       patch: int, step: int, predictor_params=None):
    """Patch grid -> per-patch pooled descriptors [B, P, F].

    The pool is computed by ops.patches.pooled_patch_grid (prefix sums +
    boundary takes) instead of extracting patch pixels: the 3D grid is 700
    overlapping 20^3 windows per volume (model_3D.py:355-359), and the
    extract-then-pool path costs three chained 45M-element gathers, an 8-D
    transpose, and their backward scatters per forward. Exact equivalence
    (values and grads) is pinned by tests/test_ops.py::TestPooledPatchGrid."""
    pooled = pooled_patch_grid(logits, patch, step,
                               modules.outputs_head.output_pooling_size)
    b, p = pooled.shape[:2]
    folded = pooled.reshape((b * p,) + pooled.shape[2:])
    out = modules.outputs_head.apply({"params": head_params}, folded,
                                     pre_pooled=True)
    if predictor_params is not None:
        out = modules.outputs_predictor.apply({"params": predictor_params},
                                              out)
    return out.reshape(b, p, -1)


def _normalized_logits(queries, keys, temp):
    q = queries / (jnp.linalg.norm(queries, axis=-1, keepdims=True) + 1e-12)
    k = keys / (jnp.linalg.norm(keys, axis=-1, keepdims=True) + 1e-12)
    return (q @ k.T) / temp


def pretrain_loss_and_updates(params, state: PretrainState,
                              modules: ISDModules, batch, cfg, labeled_bs,
                              num_classes, rng):
    """Differentiable part of the step. Returns (loss, aux)."""
    k_stu, k_tea = jax.random.split(rng)
    im_q, im_k = batch["student_image"], batch["teacher_image"]
    labels = batch["label"]

    outputs, latent, _, new_model_bs = _apply_model(
        modules.model, params["model"], state.batch_stats["model"], im_q,
        k_stu)

    # teacher (stop-gradient side), after the EMA update which the caller
    # applies to state.ema_params before calling (model_2D.py:241-243)
    ema_outputs, ema_latent, _, new_ema_bs = _apply_model(
        modules.model, state.ema_params["model"],
        state.ema_batch_stats["model"], im_k, k_tea)
    ema_outputs = jax.lax.stop_gradient(ema_outputs)
    ema_latent = jax.lax.stop_gradient(ema_latent)

    patch = cfg.patch_size
    step = patch // 2
    stu_desc = _patch_descriptors(modules, params["outputs_head"], outputs,
                                  patch, step,
                                  predictor_params=params["outputs_predictor"])
    tea_desc = _patch_descriptors(modules, state.ema_params["outputs_head"],
                                  ema_outputs, patch, step)
    tea_desc = jax.lax.stop_gradient(tea_desc)

    q_lat = modules.latent_head.apply({"params": params["latent_head"]},
                                      latent)
    q_lat = modules.latent_predictor.apply(
        {"params": params["latent_predictor"]}, q_lat)
    k_lat = modules.latent_head.apply(
        {"params": state.ema_params["latent_head"]}, ema_latent)
    k_lat = jax.lax.stop_gradient(k_lat)

    queue = jax.lax.stop_gradient(state.queue)
    queue_keys = jax.lax.stop_gradient(
        state.queue_mask.reshape(-1, state.queue_mask.shape[-1]))

    ema_latent_logits = _normalized_logits(k_lat, queue, cfg.Tt)
    latent_logits = _normalized_logits(q_lat, queue, cfg.Ts)
    bp = stu_desc.shape[0] * stu_desc.shape[1]
    ema_output_logits = _normalized_logits(
        tea_desc.reshape(bp, -1), queue_keys, cfg.Tt)
    output_logits = _normalized_logits(
        stu_desc.reshape(bp, -1), queue_keys, cfg.Ts)

    # supervised on the labeled sub-batch (pretrain_2D.py:238-242)
    probs = jax.nn.softmax(outputs[:labeled_bs].astype(jnp.float32), axis=-1)
    loss_ce = cross_entropy(outputs[:labeled_bs], labels[:labeled_bs])
    loss_dice = dice_loss(probs, labels[:labeled_bs], num_classes)
    supervised = loss_ce + loss_dice

    loss_latent = kld_batchmean(latent_logits, ema_latent_logits)
    loss_output = kld_batchmean(output_logits, ema_output_logits)
    # encoder-only pretraining drops the supervised and output-head terms
    # (pretrain_2D.py:249: `loss = args.k1 * loss_latent`)
    if getattr(cfg, "train_encoder", True) and \
            not getattr(cfg, "train_decoder", True):
        loss = cfg.k1 * loss_latent
    else:
        loss = supervised + cfg.k1 * loss_latent + cfg.k2 * loss_output

    aux = {"loss_ce": loss_ce, "loss_dice": loss_dice,
           "loss_latent": loss_latent, "loss_output": loss_output,
           "new_batch_stats": {"model": new_model_bs},
           "new_ema_batch_stats": {"model": new_ema_bs},
           "k_lat": k_lat, "tea_desc": tea_desc}
    return loss, aux


def _apply_model(model, params, batch_stats, x, rng):
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    out, mutated = model.apply(variables, x, train=True,
                               rngs={"dropout": rng},
                               mutable=["batch_stats"])
    logits, latent, fmap = out
    return logits, latent, fmap, mutated.get("batch_stats", {})


def make_pretrain_step(modules: ISDModules, cfg, tx, labeled_bs: int,
                       num_classes: int):
    """Returns jitted step(state, batch) -> (state, metrics)."""

    def step_fn(state: PretrainState, batch):
        rng, k_fwd = jax.random.split(state.rng)

        # momentum update of the teacher BEFORE its forward
        # (model_2D.py:241-243, _momentum_update_key_encoder)
        ema_params = {
            "model": ema_update(state.ema_params["model"],
                                state.params["model"], cfg.m),
            "latent_head": ema_update(state.ema_params["latent_head"],
                                      state.params["latent_head"], cfg.m),
            "outputs_head": ema_update(state.ema_params["outputs_head"],
                                       state.params["outputs_head"], cfg.m)}
        state = state._replace(ema_params=ema_params)

        (loss, aux), grads = jax.value_and_grad(
            pretrain_loss_and_updates, has_aux=True)(
                state.params, state, modules, batch, cfg, labeled_bs,
                num_classes, k_fwd)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        # enqueue (normalize first? the reference enqueues raw head outputs,
        # model_2D.py:306-307 — logits normalize at compute time)
        queue, queue_ptr = enqueue_fixed(state.queue, state.queue_ptr,
                                         aux["k_lat"])
        queue_mask, mask_ptr = enqueue_fixed(state.queue_mask,
                                             state.mask_queue_ptr,
                                             aux["tea_desc"])

        metrics = {"loss": loss, "loss_ce": aux["loss_ce"],
                   "loss_dice": aux["loss_dice"],
                   "loss_latent": aux["loss_latent"],
                   "loss_output": aux["loss_output"]}
        new_state = state._replace(
            params=params, batch_stats=aux["new_batch_stats"],
            ema_batch_stats=aux["new_ema_batch_stats"], queue=queue,
            queue_ptr=queue_ptr, queue_mask=queue_mask,
            mask_queue_ptr=mask_ptr, opt_state=opt_state, rng=rng,
            step=state.step + 1)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))
