"""3D leg of the trajectory-parity harness (VERDICT r3 item 2): drive the
REFERENCE'S OWN volumetric torch code — model_3D.create_model_3d (V-Net),
FeatureExtractor_3d, loss_helper.compute_contra_memobank_loss (the 5-D
contrastive), augment_3d.generate_unsup_data_3d, tps.rand_tps_3d.RandTPS —
through the exact per-iteration body of train_arco_3d.py:249-401 for a
multi-hundred-iteration run on CPU, against the arco_tpu 3D trainer at a
matched configuration from IDENTICAL initial weights (converted via
compat.torch_import).

Differences from the 2D harness (scripts/reference_trajectory.py) that are
REFERENCE semantics, not harness choices:
 - batch_transform is a passthrough in 3D (augment_3d.py:209-226 — every
   augmentation inside transform() is commented out), so there is no PIL
   round-trip and no photometric leg;
 - there is NO dead 6th forward in the 3D loop (train_arco_3d.py:283-287
   runs exactly five model applications);
 - the eqv term is computed but EXCLUDED from the total
   (train_arco_3d.py:390-394); the first iteration takes the opposite
   branch (iter_num==0 fails `iter_num/max_iterations > 0.0`) and trains on
   unsup + supervised + eqv with reco/loss_q excluded — replicated here;
 - memobank rows are seeded with randn (train_arco_3d.py:149), not zeros;
 - the contrastive default is func='asmc' (train_arco_3d.py, --func);
 - alpha_t uses the epoch fraction; this harness drives iterations
   directly, so both arms use the step fraction (same ramp, finer grain).

The run uses >=3 classes so the volumetric contrastive term is NONZERO —
the 2-class LA setting has reco ≡ 0 by the rank-window quirk
(tests/test_losses.py), which would make the comparison vacuous.

    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python \
        scripts/reference_trajectory_3d.py --iters 150 \
        --out docs/artifacts/ref_parity --tag trajectory_3d
"""

import argparse
import json
import os
import time

import numpy as np

VOL = (48, 48, 32)
K_CLS = 4
B = 2                       # labeled and unlabeled streams, each
N_LABELED, N_UNLABELED, N_VAL = 4, 24, 6
BASE_LR = 0.01
FEAT = 16
POOL_K = 6
TOPK = 5


def _shape_volume(rng, size, num_classes):
    """Volume with per-class 3D blobs so segmentation is learnable
    (the 3D analog of data.synthetic._shape_image)."""
    h, w, d = size
    label = np.zeros(size, np.uint8)
    yy, xx, zz = np.mgrid[0:h, 0:w, 0:d]
    for c in range(1, num_classes):
        cy = rng.randint(h // 4, 3 * h // 4)
        cx = rng.randint(w // 4, 3 * w // 4)
        cz = rng.randint(d // 4, 3 * d // 4)
        r = rng.randint(min(size) // 8, min(size) // 4)
        label[(yy - cy) ** 2 + (xx - cx) ** 2 + (zz - cz) ** 2 < r * r] = c
    image = (label.astype(np.float32) / max(num_classes - 1, 1)
             + 0.08 * rng.randn(*size).astype(np.float32))
    return np.clip(image, 0, 1.5), label


def make_data(seed=0):
    rng = np.random.RandomState(seed)
    n = N_LABELED + N_UNLABELED + N_VAL
    vols = [_shape_volume(rng, VOL, K_CLS) for _ in range(n)]
    imgs = np.stack([v[0] for v in vols])
    labs = np.stack([v[1].astype(np.int64) for v in vols])
    sl_l = slice(0, N_LABELED)
    sl_u = slice(N_LABELED, N_LABELED + N_UNLABELED)
    sl_v = slice(N_LABELED + N_UNLABELED, n)
    return (imgs[sl_l], labs[sl_l], imgs[sl_u], imgs[sl_v], labs[sl_v])


def fg_dice(pred, label):
    scores = []
    for c in range(1, K_CLS):
        p, l = pred == c, label == c
        denom = p.sum() + l.sum()
        if denom:
            scores.append(2.0 * (p & l).sum() / denom)
    return float(np.mean(scores)) if scores else 1.0


def seeded_init_state_dicts(seed):
    """Reference 3D modules with seeded init; the shared starting point of
    both arms (train_arco_3d.py:195-216)."""
    import torch
    import torch.nn as nn
    from arco_tpu.compat import refbridge as rb
    m3 = rb.import_ref("model_3D")
    torch.manual_seed(seed)
    model = m3.create_model_3d(num_classes=K_CLS)
    fe_q = m3.FeatureExtractor_3d(fea_dim=[128, 64, 32, 16, 16],
                                  output_dim=FEAT)
    q_rep = nn.Sequential(
        nn.Conv3d(FEAT, FEAT, kernel_size=1, bias=False),
        nn.Conv3d(FEAT, FEAT, kernel_size=1, bias=False))
    # random_pool = randn(K, 16, *patch).view(K, -1), normalized
    # (train_arco_3d.py:153-156)
    pool = torch.randn(POOL_K, FEAT * int(np.prod(VOL)))
    pool = torch.nn.functional.normalize(pool, dim=1)
    return model, fe_q, q_rep, pool


def run_reference(iters, seed, data, num_queries=32, num_negatives=64):
    """The reference per-iteration body (train_arco_3d.py:249-401), driven
    with the reference's own imported functions on CPU torch."""
    import torch
    import torch.nn.functional as F
    from torch.nn.modules.loss import CrossEntropyLoss

    from arco_tpu.compat import refbridge as rb
    m3 = rb.import_ref("model_3D")
    aug3 = rb.import_ref("augment_3d")
    lh = rb.import_ref("loss_helper")
    losses_mod = rb.import_ref("utils.losses")
    tps_mod = rb.import_ref("tps.rand_tps_3d")
    t3d = rb.import_ref("train_arco_3d")

    img_l_all, lab_l_all, img_u_all, img_v, lab_v = data
    import random as pyrandom
    torch.manual_seed(seed)
    pyrandom.seed(seed)
    np.random.seed(seed)

    model, fe_q, q_rep, random_pool = seeded_init_state_dicts(seed)
    ema_model = m3.create_model_3d(num_classes=K_CLS)
    ema_model.load_state_dict(model.state_dict())
    for p in ema_model.parameters():
        p.detach_()
    fe_k = m3.FeatureExtractor_3d(fea_dim=[128, 64, 32, 16, 16],
                                  output_dim=FEAT)
    with torch.no_grad():       # k init FROM q (train_arco_3d.py:227-230)
        for t_p, s_p in zip(fe_k.parameters(), fe_q.parameters()):
            t_p.data.copy_(s_p.data)
            t_p.requires_grad = False
    random_pool_ptr = torch.zeros(1, dtype=torch.long)

    # randn init rows (train_arco_3d.py:146-151)
    memobank, queue_ptrlis, queue_size = [], [], []
    for i in range(K_CLS):
        memobank.append([torch.randn(1, FEAT)])
        queue_size.append(30000)
        queue_ptrlis.append(torch.zeros(1, dtype=torch.long))
    queue_size[0] = 50000

    params = [p for p in model.parameters() if p.requires_grad]
    params_rep = [p for p in q_rep.parameters() if p.requires_grad]
    params_fea = [p for p in fe_q.parameters() if p.requires_grad]
    optimizer = torch.optim.SGD(params + params_rep + params_fea,
                                lr=BASE_LR, weight_decay=1e-4,
                                momentum=0.9, nesterov=True)
    tps = tps_mod.RandTPS(VOL[0], VOL[1], VOL[2], batch_size=B * 2,
                          sigma=0.01, border_padding=False,
                          random_mirror=True, random_scale=(0.8, 1.2),
                          mode="affine")
    model.train()
    ema_model.train()
    ce_loss = CrossEntropyLoss()
    dice_loss = losses_mod.DiceLoss(K_CLS)
    kl = torch.nn.KLDivLoss(reduction="none")

    batch_rng = np.random.RandomState(seed + 777)
    rec = {k: [] for k in ("loss", "reco", "unsup", "ce", "dice", "eqv",
                           "loss_q")}
    t0 = time.time()
    for it in range(iters):
        li = batch_rng.randint(0, len(img_l_all), B)
        ui = batch_rng.randint(0, len(img_u_all), B)
        train_l_data = torch.tensor(img_l_all[li][:, None])
        train_l_label = torch.tensor(lab_l_all[li])
        train_u_data = torch.tensor(img_u_all[ui][:, None])

        with torch.no_grad():
            pred_u, _, _ = ema_model(train_u_data)
        pseudo_logits, pseudo_labels = torch.max(
            torch.softmax(pred_u, dim=1), dim=1)

        # batch_transform is a passthrough in 3D (augment_3d.py:209-226);
        # call it anyway so any behavior change in the reference surfaces
        _, _, images_cj1_logits_l = aug3.batch_transform(
            train_l_data, train_l_label,
            logits=torch.ones_like(train_l_label) * 255,
            scale_size=(1.0, 1.0), apply_augmentation=False)
        images_cj2_l, _, _ = aug3.batch_transform(
            train_l_data, train_l_label,
            logits=torch.ones_like(train_l_label) * 255,
            scale_size=(1.0, 1.0), apply_augmentation=False)

        u_aug_data, u_aug_label, u_aug_logits = aug3.generate_unsup_data_3d(
            train_u_data, pseudo_labels, pseudo_logits, mode="cutmix")
        images_cj2_u, _, _ = aug3.batch_transform(
            u_aug_data, u_aug_label, logits=u_aug_logits,
            scale_size=(1.0, 1.0), apply_augmentation=True)
        u_aug_data, u_aug_label, u_aug_logits = aug3.batch_transform(
            u_aug_data, u_aug_label, logits=u_aug_logits,
            scale_size=(1.0, 1.0), apply_augmentation=True)

        with torch.no_grad():   # k-fe EMA (train_arco_3d.py:279-281)
            for p_q, p_k in zip(fe_q.parameters(), fe_k.parameters()):
                p_k.data = p_k.data * 0.99 + p_q.data * 0.01

        pred_l, _, l_fmap = model(train_l_data)
        pred_u, _, u_fmap = model(u_aug_data)
        pred_l_t, _, l_fmap_t = ema_model(train_l_data)
        pred_u_t, _, u_fmap_t = ema_model(u_aug_data)

        rep_l = q_rep(fe_q(l_fmap))
        rep_u = q_rep(fe_q(u_fmap))
        rep_l_teacher = fe_k(l_fmap_t)
        rep_u_teacher = fe_k(u_fmap_t)
        rep_all = torch.cat((rep_l, rep_u))
        pred_all = torch.cat((pred_l, pred_u))
        pred_all_teacher = torch.cat((rep_l_teacher, rep_u_teacher))

        loss_q = t3d.get_revisiting_loss(random_pool=random_pool,
                                         rep_u=rep_u,
                                         rep_u_teacher=rep_u_teacher,
                                         topk=TOPK)
        outputs_soft = torch.softmax(pred_l, dim=1)
        loss_ce = ce_loss(pred_l, train_l_label.long())
        loss_dice = dice_loss(outputs_soft, train_l_label.unsqueeze(1))
        supervised_loss = loss_dice + loss_ce
        unsup_loss = t3d.compute_unsupervised_loss(
            pred_u, u_aug_label, u_aug_logits, 0.97)

        alpha_t = 20 * (1 - it / iters)
        with torch.no_grad():
            label_l_1h = t3d.label_onehot(train_l_label, K_CLS)
            label_u_1h = t3d.label_onehot(u_aug_label, K_CLS)
            prob_l_teacher = torch.softmax(pred_l_t, dim=1)
            prob_u_teacher = torch.softmax(pred_u_t, dim=1)
            prob = torch.softmax(pred_u, dim=1)
            entropy = -torch.sum(prob * torch.log(prob + 1e-10), dim=1)
            valid_u = u_aug_label >= 0
            low_thresh = np.percentile(
                entropy[valid_u].cpu().numpy().flatten(), alpha_t)
            low_entropy_mask = (entropy.le(low_thresh).float()
                                * valid_u.bool())
            high_thresh = np.percentile(
                entropy[valid_u].cpu().numpy().flatten(), 100 - alpha_t)
            high_entropy_mask = (entropy.ge(high_thresh).float()
                                 * valid_u.bool())
            ones_l = (train_l_label.unsqueeze(1) >= 0).float()
            low_mask_all = torch.cat(
                (ones_l, low_entropy_mask.unsqueeze(1)))
            high_mask_all = torch.cat(
                (ones_l, high_entropy_mask.unsqueeze(1)))

        reco_loss = lh.compute_contra_memobank_loss(
            rep_all, label_l_1h.long(), label_u_1h.long(),
            prob_l_teacher.detach(), prob_u_teacher.detach(),
            low_mask_all, high_mask_all, memobank, queue_ptrlis,
            queue_size, pred_all_teacher.detach(), delta_n=0.97,
            func="asmc", num_queries=num_queries,
            num_negatives=num_negatives)[-1]

        rep_u_t_flat = rep_u_teacher.view(rep_u_teacher.shape[0], -1)
        rep_u_t_flat = torch.nn.functional.normalize(rep_u_t_flat, dim=-1)
        with torch.no_grad():   # _dequeue_and_enqueue (train_arco_3d.py:105)
            ptr = int(random_pool_ptr)
            random_pool[ptr:ptr + B] = rep_u_t_flat
            random_pool_ptr[0] = (ptr + B) % POOL_K

        labels = torch.cat((train_l_label, u_aug_label), dim=0)
        logits = torch.cat((images_cj1_logits_l, u_aug_logits), dim=0)
        mask = torch.ones(labels.shape)
        neg = torch.zeros_like(mask)
        mask = torch.where(labels == 0, neg, mask)
        mask = torch.where(logits < 0.7, neg, mask).unsqueeze(1)
        images_cj2 = torch.cat((images_cj2_l, images_cj2_u), dim=0)
        tps.reset_control_points()
        images_tps = tps(images_cj2)
        mask_tps = tps(mask.float(), padding_mode="zeros")
        pred_tps = model(images_tps)[0]
        pred_d = pred_all.detach()
        pred_tps_org = tps(pred_d, padding_mode="zeros")
        loss_eqv = kl(F.log_softmax(pred_tps, dim=1),
                      F.softmax(pred_tps_org, dim=1))
        loss_eqv = (loss_eqv * mask_tps).flatten(1).sum(1) \
            / (mask_tps.flatten(1).sum(1) + 1e-7)
        loss_eqv = loss_eqv.mean()

        # train_arco_3d.py:390-394: eqv EXCLUDED from the total except on
        # the very first iteration (where reco/loss_q are excluded instead)
        if it > 0:
            loss = (0.01 * reco_loss + 1.0 * unsup_loss + supervised_loss
                    + 1.0 * loss_q)
        else:
            loss = unsup_loss + supervised_loss + loss_eqv
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()
        with torch.no_grad():   # isd._momentum_update_key_encoder, m=0.99
            for p_e, p_s in zip(ema_model.parameters(), model.parameters()):
                p_e.data = p_e.data * 0.99 + p_s.data * 0.01
        lr_ = BASE_LR * (1.0 - it / iters) ** 0.9
        for g in optimizer.param_groups:
            g["lr"] = lr_

        for k, v in (("loss", loss), ("reco", reco_loss),
                     ("unsup", unsup_loss), ("ce", loss_ce),
                     ("dice", loss_dice), ("eqv", loss_eqv),
                     ("loss_q", loss_q)):
            rec[k].append(float(v))
        if (it + 1) % 10 == 0:
            print(f"[ref3d seed{seed}] iter {it + 1}/{iters} "
                  f"loss {float(loss):.4f} reco {float(reco_loss):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    model.eval()
    with torch.no_grad():
        preds = []
        for i in range(len(img_v)):
            p = model(torch.tensor(img_v[i][None, None]))[0]
            preds.append(p.argmax(1)[0].numpy())
    dice = float(np.mean([fg_dice(p, l) for p, l in zip(preds, lab_v)]))
    return rec, dice, time.time() - t0


def run_arco(iters, seed, data, init_seed, num_queries=32,
             num_negatives=64, enqueue_per_class=None, compute_eqv=True):
    """arco_tpu 3D trainer at the matched config, initialized from the SAME
    reference weights (converted)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from arco_tpu.compat.torch_import import (
        convert_feature_extractor_state_dict,
        convert_q_representation_state_dict, convert_vnet_state_dict)
    from arco_tpu.config import ArcoConfig
    from arco_tpu.models import net_factory_3d
    from arco_tpu.train.arco2d import (init_arco_state, make_arco_modules,
                                       make_arco_step)
    from arco_tpu.train.schedule import make_optimizer

    img_l_all, lab_l_all, img_u_all, img_v, lab_v = data
    ref_model, ref_fe, ref_qr, ref_pool = seeded_init_state_dicts(init_seed)
    params_m, stats_m = convert_vnet_state_dict(ref_model.state_dict())
    params_fe = convert_feature_extractor_state_dict(ref_fe.state_dict())
    params_qr = convert_q_representation_state_dict(ref_qr.state_dict())
    pool_native = jnp.asarray(
        ref_pool.numpy().reshape((POOL_K, FEAT) + VOL)
        .transpose(0, 2, 3, 4, 1))

    # the 3D trainer's method config (cli/train_arco_3d.py:40-62):
    # eqv logged but excluded, no photometric/adv-morph (batch_transform is
    # a 3D passthrough), randn memobank rows, func='asmc'
    cfg = dataclasses.replace(
        ArcoConfig(), num_queries=num_queries,
        num_negatives=num_negatives, K=POOL_K, topk=TOPK, func="asmc",
        use_eqv_loss=False, compute_eqv=compute_eqv, use_photometric=False,
        use_adv_morph=False, memobank_init="randn", remat=False)
    if enqueue_per_class:
        # bank-composition knob (diag3d finding): the loss is EXACT on a
        # matched bank (<=0.15% over three probes), so the late-window reco
        # gap must live in bank composition — the reference enqueues ~1e3
        # keys/class/step and its FIFO keeps only the last ~30 steps, while
        # the default stratified-256 bank spans the whole run. A larger
        # per-step enqueue wraps the ring and reproduces the reference's
        # recent-dominated profile.
        cfg = dataclasses.replace(cfg, memobank_enqueue=enqueue_per_class)
    model = net_factory_3d("vnet", in_chns=1, class_num=K_CLS)
    modules = make_arco_modules(
        model, VOL[1], VOL[0], batch_size=B, total_batch=2 * B,
        feature_channels=(128, 64, 32, 16, 16), fused_dim=FEAT)
    tx = make_optimizer(BASE_LR, iters)
    state = init_arco_state(jax.random.PRNGKey(seed), modules, cfg,
                            (B,) + VOL + (1,), tx,
                            model_params=params_m,
                            model_batch_stats=stats_m)
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    params = dict(state.params)
    params["feature_extractor"] = params_fe
    params["q_representation"] = params_qr
    state = state._replace(
        params=params,
        ema_params={"model": copy(params_m)},
        k_feature_params=copy(params_fe),
        random_pool=pool_native.astype(state.random_pool.dtype),
        opt_state=tx.init(params))

    step_fn = make_arco_step(modules, cfg, tx, num_classes=K_CLS,
                             max_iterations=iters)
    batch_rng = np.random.RandomState(seed + 777)
    rec = {k: [] for k in ("loss", "reco", "unsup", "ce", "dice", "eqv",
                           "loss_q")}
    t0 = time.time()
    names = {"loss": "loss", "reco": "reco_loss", "unsup": "unsup_loss",
             "ce": "loss_ce", "dice": "loss_dice", "eqv": "loss_eqv",
             "loss_q": "loss_q"}
    for it in range(iters):
        li = batch_rng.randint(0, len(img_l_all), B)
        ui = batch_rng.randint(0, len(img_u_all), B)
        batch = {"image_l": jnp.asarray(img_l_all[li][..., None]),
                 "label_l": jnp.asarray(lab_l_all[li]),
                 "image_u": jnp.asarray(img_u_all[ui][..., None])}
        state, metrics = step_fn(state, batch)
        for k, mk in names.items():
            rec[k].append(float(metrics[mk]))
        if (it + 1) % 10 == 0:
            print(f"[arco3d seed{seed}] iter {it + 1}/{iters} "
                  f"loss {rec['loss'][-1]:.4f} reco {rec['reco'][-1]:.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    variables = {"params": state.params["model"],
                 "batch_stats": state.batch_stats["model"]}
    predict = jax.jit(lambda x: jnp.argmax(model.apply(
        variables, x, train=False,
        rngs={"dropout": jax.random.PRNGKey(0)})[0], -1))
    preds = [np.asarray(predict(jnp.asarray(img_v[i][None, ..., None])))[0]
             for i in range(len(img_v))]
    dice = float(np.mean([fg_dice(p, l) for p, l in zip(preds, lab_v)]))
    return rec, dice, time.time() - t0


def window_means(rec, frac=0.25):
    n = len(rec["loss"])
    w = max(int(n * frac), 1)
    return {k: float(np.mean(v[-w:])) for k, v in rec.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=150)
    ap.add_argument("--ref-seeds", type=int, nargs="*", default=[0])
    ap.add_argument("--arco-seeds", type=int, nargs="*", default=[0, 1])
    ap.add_argument("--num-queries", type=int, default=32)
    ap.add_argument("--num-negatives", type=int, default=64)
    ap.add_argument("--enqueue-per-class", type=int, default=None,
                    help="override ArcoConfig.memobank_enqueue (bank-"
                         "composition attribution, diag3d)")
    ap.add_argument("--no-eqv-forward", action="store_true",
                    help="skip the log-only eqv forward on the arco arm "
                         "(3D cadence measurement: train_arco_3d.py:390-391"
                         " excludes eqv from the loss, so the forward only "
                         "nudges BN stats)")
    ap.add_argument("--out", default="docs/artifacts/ref_parity")
    ap.add_argument("--tag", default="trajectory_3d")
    args = ap.parse_args()

    data = make_data(seed=0)
    results = {"iters": args.iters, "vol": VOL, "num_classes": K_CLS,
               "num_queries": args.num_queries,
               "num_negatives": args.num_negatives,
               "labeled": N_LABELED, "unlabeled": N_UNLABELED,
               "ref": [], "arco": []}
    for s in args.ref_seeds:
        rec, dice, wall = run_reference(args.iters, s, data,
                                        args.num_queries,
                                        args.num_negatives)
        results["ref"].append({"seed": s, "dice": dice, "wall_s": wall,
                               "late_means": window_means(rec),
                               "curve_loss": rec["loss"]})
        print(f"[ref3d seed{s}] dice {dice:.4f} wall {wall:.0f}s",
              flush=True)
        _dump(args, results)
    for s in args.arco_seeds:
        rec, dice, wall = run_arco(args.iters, s, data, init_seed=0,
                                   num_queries=args.num_queries,
                                   num_negatives=args.num_negatives,
                                   enqueue_per_class=args.enqueue_per_class,
                                   compute_eqv=not args.no_eqv_forward)
        results["arco"].append({"seed": s, "dice": dice, "wall_s": wall,
                                "late_means": window_means(rec),
                                "curve_loss": rec["loss"]})
        print(f"[arco3d seed{s}] dice {dice:.4f} wall {wall:.0f}s",
              flush=True)
        _dump(args, results)

    print(json.dumps({
        "ref_dice": [r["dice"] for r in results["ref"]],
        "arco_dice": [r["dice"] for r in results["arco"]],
        "ref_late": (results["ref"][0]["late_means"]
                     if results["ref"] else None),
        "arco_late": (results["arco"][0]["late_means"]
                      if results["arco"] else None)}, indent=1))


def _dump(args, results):
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, f"{args.tag}.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
