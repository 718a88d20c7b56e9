"""Leg (c) of the reference-parity harness (VERDICT r2 item 1): drive the
REFERENCE'S OWN torch code through a full multi-hundred-iteration ARCO
training trajectory on CPU and compare it against the arco_tpu trainer at a
matched configuration — same synthetic task, same label budget, identical
initial weights (converted via compat.torch_import), same loss weights and
optimizer schedule.

The reference arm composes the reference's imported functions in the exact
per-iteration order of train_arco_2d.py:278-436 (citations inline); nothing
is re-implemented — model_2D.ISD/FeatureExtractor, augment.batch_transform /
randomGeneratorWithLogits / generate_unsup_data (full PIL round-trip incl.
its uint8 quantization), loss_helper_3d.compute_contra_memobank_loss,
tps.rand_tps.RandTPS, utils.losses.DiceLoss all run verbatim. Two knobs are
made explicit because the harness drives iterations directly instead of
epoch-sized loaders:
 - image size is a flag (the trainer's call to randomGeneratorWithLogits
   relies on its [256,256] default; here output_size is passed),
 - the entropy-split ramp alpha_t uses the step fraction rather than the
   reference's epoch fraction (train_arco_2d.py:342-344) — the same ramp at
   finer granularity, applied to both arms,
 - num_queries/num_negatives are flags (default 64/128, reference budget is
   256/512): this host has ONE cpu core and the reference's own
   torch.cosine_similarity over (Q,1+N,496) costs ~9 s/call at the full
   sizes (~45 s/iteration); both arms use the same matched values so the
   comparison stays apples-to-apples.

Trajectory equivalence is statistical (every aug draw is stochastic): the
arms must agree on end-of-run held-out Dice and on late-window loss-term
means within the seed spread.

    PYTHONPATH=/root/repo python scripts/reference_trajectory.py \
        --iters 300 --out docs/artifacts/ref_parity
"""

import argparse
import json
import os
import time

import numpy as np

HW = 64
K_CLS = 4
B = 4                      # both loaders use batch_size=4 (train_arco_2d.py:199-215)
N_LABELED, N_UNLABELED, N_VAL = 8, 120, 16
BASE_LR = 0.01
FEAT = 256 + 128 + 64 + 32 + 16
POOL_K = 36


def make_data(seed=0):
    from arco_tpu.data.synthetic import _shape_image
    rng = np.random.RandomState(seed)
    n = N_LABELED + N_UNLABELED + N_VAL
    imgs, labs = [], []
    for _ in range(n):
        im, lb = _shape_image(rng, (HW, HW), K_CLS)
        imgs.append(im)
        labs.append(lb.astype(np.int64))
    imgs, labs = np.stack(imgs), np.stack(labs)
    sl_l = slice(0, N_LABELED)
    sl_u = slice(N_LABELED, N_LABELED + N_UNLABELED)
    sl_v = slice(N_LABELED + N_UNLABELED, n)
    return (imgs[sl_l], labs[sl_l], imgs[sl_u],
            imgs[sl_v], labs[sl_v])


def fg_dice(pred, label):
    scores = []
    for c in range(1, K_CLS):
        p, l = pred == c, label == c
        denom = p.sum() + l.sum()
        if denom:
            scores.append(2.0 * (p & l).sum() / denom)
    return float(np.mean(scores)) if scores else 1.0


def seeded_init_state_dicts(seed):
    """Reference modules with seeded init; their state dicts are the shared
    starting point of both arms."""
    import torch
    from arco_tpu.compat import refbridge as rb
    m2 = rb.import_ref("model_2D")
    import torch.nn as nn
    torch.manual_seed(seed)
    model = m2.create_model(num_classes=K_CLS)
    fe_q = m2.FeatureExtractor(fea_dim=[256, 128, 64, 32, 16],
                               output_dim=FEAT)
    q_rep = nn.Sequential(
        nn.Conv2d(FEAT, FEAT, kernel_size=1, bias=False),
        nn.Conv2d(FEAT, FEAT, kernel_size=1, bias=False))
    pool = torch.randn(POOL_K, FEAT * HW * HW)
    pool = torch.nn.functional.normalize(pool, dim=1)
    return model, fe_q, q_rep, pool


def run_reference(iters, seed, data, num_queries=64, num_negatives=128):
    """The reference per-iteration body (train_arco_2d.py:278-436), driven
    with the reference's own imported functions on CPU torch."""
    import torch
    import torch.nn.functional as F
    from torch.nn.modules.loss import CrossEntropyLoss

    from arco_tpu.compat import refbridge as rb
    m2 = rb.import_ref("model_2D")
    aug = rb.import_ref("augment")
    lh = rb.import_ref("loss_helper_3d")
    losses_mod = rb.import_ref("utils.losses")
    tps_mod = rb.import_ref("tps.rand_tps")
    t2d = rb.import_ref("train_arco_2d")
    adv_mod = rb.import_ref("adv_morph")

    # AdvMorph binds torch.device('cuda') when use_gpu=True
    # (adv_morph.py:33-34); keep its semantics, run it on CPU.
    aug.AdvMorph = lambda config_dict, debug=False, use_gpu=True: \
        adv_mod.AdvMorph(config_dict=config_dict, debug=debug, use_gpu=False)

    img_l_all, lab_l_all, img_u_all, img_v, lab_v = data
    import random as pyrandom
    torch.manual_seed(seed)
    pyrandom.seed(seed)
    np.random.seed(seed)

    model, fe_q, q_rep, random_pool = seeded_init_state_dicts(seed)
    ema_model = m2.create_model(num_classes=K_CLS)
    ema_model.load_state_dict(model.state_dict())
    for p in ema_model.parameters():
        p.detach_()
    fe_k = m2.FeatureExtractor(fea_dim=[256, 128, 64, 32, 16],
                               output_dim=FEAT)
    # k initialized FROM q (train_arco_2d.py:250-253)
    with torch.no_grad():
        for t_p, s_p in zip(fe_k.parameters(), fe_q.parameters()):
            t_p.data.copy_(s_p.data)
            t_p.requires_grad = False
    random_pool_ptr = torch.zeros(1, dtype=torch.long)

    memobank, queue_ptrlis, queue_size = [], [], []
    for i in range(K_CLS):
        memobank.append([torch.zeros(1, FEAT)])
        queue_size.append(30000)
        queue_ptrlis.append(torch.zeros(1, dtype=torch.long))
    queue_size[0] = 50000

    params = [p for p in model.parameters() if p.requires_grad]
    params_rep = [p for p in q_rep.parameters() if p.requires_grad]
    params_fea = [p for p in fe_q.parameters() if p.requires_grad]
    optimizer = torch.optim.SGD(params + params_rep + params_fea,
                                lr=BASE_LR, weight_decay=1e-4,
                                momentum=0.9, nesterov=True)
    tps = tps_mod.RandTPS(HW, HW, batch_size=B * 2, sigma=0.01,
                          border_padding=False, random_mirror=True,
                          random_scale=(0.8, 1.2), mode="affine")
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
        # the reference dataloader yields uint8 labels (dataset.py ToTensor:
        # label.astype(np.uint8)); the 255-valued dummy logits ride the PIL
        # round-trip as uint8 'L' images
        train_l_label = torch.tensor(lab_l_all[li].astype(np.uint8))
        train_u_data = torch.tensor(img_u_all[ui][:, None])

        with torch.no_grad():
            pred_u, _, _ = ema_model(train_u_data)
        pseudo_logits, pseudo_labels = torch.max(
            torch.softmax(pred_u, dim=1), dim=1)

        _, _, images_cj1_logits_l = aug.batch_transform(
            train_l_data, train_l_label,
            logits=torch.ones_like(train_l_label) * 255,
            crop_size=(HW, HW), scale_size=(1.0, 1.0),
            apply_augmentation=False)
        images_cj2_l, _, _ = aug.batch_transform(
            train_l_data, train_l_label,
            logits=torch.ones_like(train_l_label) * 255,
            crop_size=(HW, HW), scale_size=(1.0, 1.0),
            apply_augmentation=False)

        u_aug_data, u_aug_label, u_aug_logits = \
            aug.randomGeneratorWithLogits(train_u_data, pseudo_labels,
                                          pseudo_logits,
                                          output_size=[HW, HW])
        u_aug_data, u_aug_label, u_aug_logits = aug.generate_unsup_data(
            u_aug_data, u_aug_label, u_aug_logits, mode="cutmix")
        images_cj2_u, _, _ = aug.batch_transform(
            u_aug_data, u_aug_label, logits=u_aug_logits,
            crop_size=(HW, HW), scale_size=(1.0, 1.0),
            apply_augmentation=True)
        u_aug_data, u_aug_label, u_aug_logits = aug.batch_transform(
            u_aug_data, u_aug_label, logits=u_aug_logits,
            crop_size=(HW, HW), scale_size=(1.0, 1.0),
            apply_augmentation=True)

        with torch.no_grad():
            for p_q, p_k in zip(fe_q.parameters(), fe_k.parameters()):
                p_k.data = p_k.data * 0.99 + p_q.data * 0.01

        pred_l, _, l_fmap = model(train_l_data)
        _, _, l_fmap_2 = model(images_cj2_l)       # dead compute, kept
        pred_u, _, u_fmap = model(u_aug_data)
        pred_l_t, _, l_fmap_t = ema_model(train_l_data)
        pred_u_t, _, u_fmap_t = ema_model(u_aug_data)

        l_feat = fe_q(l_fmap)
        u_feat = fe_q(u_fmap)
        rep_l = q_rep(l_feat)
        rep_u = q_rep(u_feat)
        rep_l_teacher = fe_k(l_fmap_t)
        rep_u_teacher = fe_k(u_fmap_t)
        rep_all = torch.cat((rep_l, rep_u))
        pred_all = torch.cat((pred_l, pred_u))
        pred_all_teacher = torch.cat((rep_l_teacher, rep_u_teacher))

        loss_q = t2d.get_revisiting_loss(random_pool=random_pool,
                                         rep_u=rep_u,
                                         rep_u_teacher=rep_u_teacher,
                                         topk=5)
        outputs_soft = torch.softmax(pred_l, dim=1)
        loss_ce = ce_loss(pred_l, train_l_label.long())
        loss_dice = dice_loss(outputs_soft, train_l_label.unsqueeze(1))
        supervised_loss = loss_dice + loss_ce
        unsup_loss = t2d.compute_unsupervised_loss(
            pred_u, u_aug_label, u_aug_logits, 0.97)

        alpha_t = 20 * (1 - it / iters)
        with torch.no_grad():
            label_l_1h = F.interpolate(
                t2d.label_onehot(train_l_label, K_CLS),
                size=pred_all.shape[2:], mode="nearest")
            label_u_1h = F.interpolate(
                t2d.label_onehot(u_aug_label, K_CLS),
                size=pred_all.shape[2:], mode="nearest")
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
            func="smc", num_queries=num_queries,
            num_negatives=num_negatives)[-1]

        rep_u_t_flat = rep_u_teacher.view(rep_u_teacher.shape[0], -1)
        rep_u_t_flat = torch.nn.functional.normalize(rep_u_t_flat, dim=-1)
        with torch.no_grad():                       # _dequeue_and_enqueue
            ptr = int(random_pool_ptr)
            random_pool[ptr:ptr + B] = rep_u_t_flat
            random_pool_ptr[0] = (ptr + B) % POOL_K

        labels = torch.cat((train_l_label, u_aug_label), dim=0)
        logits = torch.cat((images_cj1_logits_l, u_aug_logits), dim=0)
        mask = torch.ones((rep_all.shape[0], rep_all.shape[2],
                           rep_all.shape[3]))
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

        loss = (0.01 * reco_loss + 1.0 * unsup_loss + supervised_loss
                + 1.0 * loss_eqv + 1.0 * loss_q)
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()
        with torch.no_grad():                  # isd EMA, m=0.99
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
        if (it + 1) % 25 == 0:
            print(f"[ref seed{seed}] iter {it + 1}/{iters} "
                  f"loss {float(loss):.4f} ({time.time() - t0:.0f}s)",
                  flush=True)

    model.eval()
    with torch.no_grad():
        preds = []
        for i in range(len(img_v)):
            p = model(torch.tensor(img_v[i][None, None]))[0]
            preds.append(p.argmax(1)[0].numpy())
    dice = float(np.mean([fg_dice(p, l) for p, l in zip(preds, lab_v)]))
    return rec, dice, time.time() - t0


VARIANT_CFG = {
    # VERDICT r3 item 3: re-add the reference's intentional-delta behaviors
    # one at a time in the rebuild arm to attribute the Dice dominance.
    "base": {},
    # the reference's dead 6th forward advances BN running stats
    "dead": {"dead_forward": True},
    # the reference's PIL round-trip quantizes every augmented image/logit
    "quant": {"quantize_augs": True},
    # the reference enqueues EVERY matching negative pixel; approximate
    # enqueue-all by raising the per-class stratified cap 256 -> 2048
    "enq": {"memobank_enqueue": 2048},
    "all": {"dead_forward": True, "quantize_augs": True,
            "memobank_enqueue": 2048},
}


def run_arco(iters, seed, data, init_seed, num_queries=64,
             num_negatives=128, variant="base"):
    """arco_tpu trainer at the matched config, initialized from the SAME
    reference weights (converted)."""
    import jax
    import jax.numpy as jnp

    from arco_tpu.compat.torch_import import (
        convert_feature_extractor_state_dict,
        convert_q_representation_state_dict, convert_unet_state_dict)
    from arco_tpu.config import ArcoConfig
    from arco_tpu.models import net_factory
    from arco_tpu.train.arco2d import (init_arco_state, make_arco_modules,
                                       make_arco_step)
    from arco_tpu.train.schedule import make_optimizer

    img_l_all, lab_l_all, img_u_all, img_v, lab_v = data
    ref_model, ref_fe, ref_qr, ref_pool = seeded_init_state_dicts(init_seed)
    params_m, stats_m = convert_unet_state_dict(ref_model.state_dict())
    params_fe = convert_feature_extractor_state_dict(ref_fe.state_dict())
    params_qr = convert_q_representation_state_dict(ref_qr.state_dict())
    pool_native = jnp.asarray(
        ref_pool.numpy().reshape(POOL_K, FEAT, HW, HW)
        .transpose(0, 2, 3, 1))

    import dataclasses
    cfg = dataclasses.replace(ArcoConfig(), num_queries=num_queries,
                              num_negatives=num_negatives,
                              **VARIANT_CFG[variant])
    model = net_factory("unet", in_chns=1, class_num=K_CLS)
    modules = make_arco_modules(model, HW, HW, batch_size=B)
    tx = make_optimizer(BASE_LR, iters)
    state = init_arco_state(jax.random.PRNGKey(seed), modules, cfg,
                            (B, HW, HW, 1), tx,
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
        if (it + 1) % 50 == 0:
            print(f"[arco seed{seed}] iter {it + 1}/{iters} "
                  f"loss {rec['loss'][-1]:.4f} ({time.time() - t0:.0f}s)",
                  flush=True)

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
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--ref-seeds", type=int, nargs="*", default=[0])
    ap.add_argument("--arco-seeds", type=int, nargs="+", default=[0, 1])
    ap.add_argument("--num-queries", type=int, default=64)
    ap.add_argument("--num-negatives", type=int, default=128)
    ap.add_argument("--arco-variants", nargs="+", default=["base"],
                    choices=sorted(VARIANT_CFG),
                    help="rebuild-arm ablation variants (VERDICT r3 #3)")
    ap.add_argument("--out", default="docs/artifacts/ref_parity")
    ap.add_argument("--tag", default="trajectory",
                    help="output filename stem")
    args = ap.parse_args()

    data = make_data(seed=0)
    results = {"iters": args.iters, "hw": HW,
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
        print(f"[ref seed{s}] dice {dice:.4f} wall {wall:.0f}s", flush=True)
        _dump(args, results)
    for variant in args.arco_variants:
        for s in args.arco_seeds:
            rec, dice, wall = run_arco(args.iters, s, data, init_seed=0,
                                       num_queries=args.num_queries,
                                       num_negatives=args.num_negatives,
                                       variant=variant)
            results["arco"].append({"seed": s, "variant": variant,
                                    "dice": dice, "wall_s": wall,
                                    "late_means": window_means(rec),
                                    "curve_loss": rec["loss"]})
            print(f"[arco/{variant} seed{s}] dice {dice:.4f} "
                  f"wall {wall:.0f}s", flush=True)
            _dump(args, results)

    _dump(args, results)
    ref_d = [r["dice"] for r in results["ref"]]
    by_variant = {}
    for r in results["arco"]:
        by_variant.setdefault(r.get("variant", "base"), []).append(r["dice"])
    print(json.dumps({
        "ref_dice": ref_d, "arco_dice_by_variant": by_variant,
        "ref_late": (results["ref"][0]["late_means"]
                     if results["ref"] else None),
        "arco_late": results["arco"][0]["late_means"]}, indent=1))


def _dump(args, results):
    """Write after every completed arm so a timeout keeps partial results."""
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, f"{args.tag}.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
