"""Instrument ONE matched iteration of the 3D trajectory harness (VERDICT
r4 item 2): locate where the volumetric contrastive (reco) and eqv terms
diverge between the reference torch body and the arco_tpu implementation.

Method: drive the REFERENCE loop (scripts/reference_trajectory_3d.run_reference
semantics) for N iterations on CPU torch; at chosen probe iterations, freeze
the exact inputs of compute_contra_memobank_loss (reps, teacher probs, masks,
memobank contents) and evaluate BOTH implementations on those identical
inputs, each over R sampler re-draws:

  - ref reco distribution: loss_helper.compute_contra_memobank_loss on deep
    bank copies, R torch seeds;
  - arco reco distribution: arco_tpu.losses.contrastive on a MemoBank built
    from the same rows, R PRNG keys, with enqueueing disabled-equivalent
    (we report the loss only; the returned bank is discarded).

If the distributions agree on matched inputs, the trajectory-level +83% reco
gap is an INPUT/STATE divergence (bank composition under stratified-256
enqueue vs enqueue-all, or trainer-side mask drift); a bank-composition probe
quantifies that separately by re-evaluating the reference loss on a bank
subsampled to the stratified-enqueue budget.

The eqv probe compares the masked-KL eqv value on the SAME prediction
tensors under both TPS implementations (R draws each) — attributing the
-58% gap between warp-field distribution vs loss arithmetic.

    PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=cpu \
        python scripts/diag_traj3d.py --iters 40 --probes 8 30 \
        --out docs/artifacts/ref_parity/diag3d.json
"""

import argparse
import json
import os
import sys
import time

import numpy as np

# the axon sitecustomize force-selects the tunneled TPU at interpreter
# start; honoring JAX_PLATFORMS=cpu needs the explicit config update too
# (tests/conftest.py:8-23)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from reference_trajectory_3d import (B, FEAT, K_CLS, POOL_K, TOPK, VOL,
                                     BASE_LR, make_data,
                                     seeded_init_state_dicts)


def ref_reco_samples(lh, inputs, memobank, queue_ptrlis, queue_size,
                     num_queries, num_negatives, reps=8):
    """Reference reco on deep bank copies over `reps` torch seeds."""
    import torch
    vals = []
    for r in range(reps):
        torch.manual_seed(10_000 + r)
        np.random.seed(10_000 + r)
        bank = [[t.clone() for t in cls] for cls in memobank]
        ptrs = [p.clone() for p in queue_ptrlis]
        out = lh.compute_contra_memobank_loss(
            inputs["rep_all"], inputs["label_l_1h"], inputs["label_u_1h"],
            inputs["prob_l_t"], inputs["prob_u_t"],
            inputs["low_mask_all"], inputs["high_mask_all"],
            bank, ptrs, list(queue_size), inputs["rep_teacher_all"],
            delta_n=0.97, func="asmc", num_queries=num_queries,
            num_negatives=num_negatives)
        vals.append(float(out[-1]))
    return vals


def arco_reco_samples(inputs, memobank, num_queries, num_negatives,
                      reps=8, enqueue_per_class=256):
    """arco reco on a MemoBank built from the reference's exact bank rows,
    identical converted inputs, over `reps` PRNG keys."""
    import jax
    import jax.numpy as jnp

    from arco_tpu.losses.contrastive import (MemoBank,
                                             compute_contra_memobank_loss,
                                             descending_rank, _l2_normalize)

    # torch [B, C, X, Y, Z] -> [B, X, Y, Z, C]
    tr = lambda t: jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 4, 1))
    rep_all = tr(inputs["rep_all"])
    rep_teacher_all = tr(inputs["rep_teacher_all"])
    prob_l_t, prob_u_t = tr(inputs["prob_l_t"]), tr(inputs["prob_u_t"])
    prob_all = jnp.concatenate([prob_l_t, prob_u_t], axis=0)
    label_l_1h, label_u_1h = tr(inputs["label_l_1h"]), tr(inputs["label_u_1h"])
    label_all = jnp.concatenate([label_l_1h, label_u_1h], axis=0)
    label_l_padded = jnp.concatenate(
        [label_l_1h, jnp.zeros_like(label_u_1h)], axis=0)
    low_mask = jnp.asarray(
        inputs["low_mask_all"].detach().numpy()[:, 0])   # [B, X, Y, Z]
    high_mask = jnp.asarray(inputs["high_mask_all"].detach().numpy()[:, 0])
    rank_all = descending_rank(prob_all)
    n_l = label_l_1h.shape[0]
    is_labeled = jnp.concatenate(
        [jnp.ones((n_l,), bool),
         jnp.zeros((label_u_1h.shape[0],), bool)])

    # bank: same rows, stored normalized (the arco convention; cosine-sim
    # math is identical)
    counts = [cls[0].shape[0] for cls in memobank]
    caps = tuple([50000] + [30000] * (K_CLS - 1))
    # headroom for the loss's own in-step enqueue: count grows past the
    # imported rows, and indices drawn beyond data.shape[1] come back as
    # NaN under take_along_axis's fill mode (the product allocates at full
    # capacity, where count <= rows always holds)
    cap = max(max(counts), 1) + enqueue_per_class
    data = np.zeros((K_CLS, cap, FEAT), np.float32)
    for i, cls in enumerate(memobank):
        rows = cls[0].detach().numpy()
        data[i, :len(rows)] = np.asarray(
            _l2_normalize(jnp.asarray(rows)))
    bank = MemoBank(data=jnp.asarray(data),
                    ptr=jnp.asarray([c % caps[i] for i, c in
                                     enumerate(counts)], jnp.int32),
                    count=jnp.asarray(counts, jnp.int32),
                    capacities=caps)

    fn = jax.jit(lambda k, bk: compute_contra_memobank_loss(
        k, rep_all, label_all, prob_all, rank_all, is_labeled,
        label_l_padded, low_mask, high_mask, rep_teacher_all, bk,
        delta_n=0.97, func="asmc", num_queries=num_queries,
        num_negatives=num_negatives,
        enqueue_per_class=enqueue_per_class)[1])
    return [float(fn(jax.random.PRNGKey(20_000 + r), bank))
            for r in range(reps)]


def probe_stats(inputs, memobank):
    """Deterministic per-class diagnostics on the frozen inputs."""
    import torch
    low_valid = torch.cat((inputs["label_l_1h"], inputs["label_u_1h"]),
                          dim=0) * inputs["low_mask_all"]
    high_valid = torch.cat((inputs["label_l_1h"], inputs["label_u_1h"]),
                           dim=0) * inputs["high_mask_all"]
    prob = torch.cat((inputs["prob_l_t"], inputs["prob_u_t"]), dim=0)
    out = []
    for i in range(K_CLS):
        lv = low_valid[:, i].bool()
        anchors = int(((prob[:, i] > 0.3) & lv).sum())
        out.append({"cls": i, "n_low_valid": int(lv.sum()),
                    "n_anchor_cand": anchors,
                    "n_high_valid": int(high_valid[:, i].bool().sum()),
                    "bank_rows": int(memobank[i][0].shape[0])})
    return out


def eqv_samples(model, pred_all, images_cj2, mask, reps=6):
    """eqv under (a) the reference RandTPS 3D and (b) the arco TPS, on the
    SAME prediction tensors: both warp images/mask/detached preds and take
    masked KL(pred_tps_fwd || warp(pred)). The model forward on warped
    images is shared per-arm (each arm's own warp of the same images)."""
    import torch
    import torch.nn.functional as F

    from arco_tpu.compat import refbridge as rb
    tps_mod = rb.import_ref("tps.rand_tps_3d")
    kl = torch.nn.KLDivLoss(reduction="none")

    ref_vals = []
    tps = tps_mod.RandTPS(VOL[0], VOL[1], VOL[2], batch_size=B * 2,
                          sigma=0.01, border_padding=False,
                          random_mirror=True, random_scale=(0.8, 1.2),
                          mode="affine")
    for r in range(reps):
        torch.manual_seed(30_000 + r)
        np.random.seed(30_000 + r)
        tps.reset_control_points()
        images_tps = tps(images_cj2)
        mask_tps = tps(mask.float(), padding_mode="zeros")
        with torch.no_grad():
            pred_tps = model(images_tps)[0]
        pred_tps_org = tps(pred_all.detach(), padding_mode="zeros")
        le = kl(F.log_softmax(pred_tps, dim=1),
                F.softmax(pred_tps_org, dim=1))
        le = (le * mask_tps).flatten(1).sum(1) / (
            mask_tps.flatten(1).sum(1) + 1e-7)
        ref_vals.append(float(le.mean()))
    return ref_vals


def arco_eqv_samples(params_m, stats_m, pred_all, images_cj2, mask, reps=6):
    """The arco TPS + equivariance_loss on the converted model and the same
    tensors (torch layout [B, C, X, Y, Z] -> [B, X, Y, Z, C])."""
    import jax
    import jax.numpy as jnp

    from arco_tpu.augment.tps import RandTPS
    from arco_tpu.losses.consistency import equivariance_loss
    from arco_tpu.models import net_factory_3d

    tr = lambda t: jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 4, 1))
    pred = tr(pred_all)
    imgs = tr(images_cj2)
    msk = tr(mask.float())
    model = net_factory_3d("vnet", in_chns=1, class_num=K_CLS)
    variables = {"params": params_m, "batch_stats": stats_m}

    tps = RandTPS(VOL[1], VOL[0], batch_size=B * 2, sigma=0.01,
                  random_mirror=True, random_scale=(0.8, 1.2),
                  mode="affine")

    @jax.jit
    def one(key):
        grid = tps.reset(key)
        c_img = imgs.shape[-1]
        stacked = jnp.concatenate([imgs, msk, pred], axis=-1)
        warped = tps.apply(stacked, grid, padding_mode="zeros")
        images_tps = warped[..., :c_img]
        mask_tps = warped[..., c_img:c_img + 1]
        pred_tps_org = warped[..., c_img + 1:]
        pred_tps = model.apply(variables, images_tps, train=True,
                               rngs={"dropout": jax.random.PRNGKey(0)},
                               mutable=["batch_stats"])[0][0]
        return equivariance_loss(pred_tps, pred_tps_org, mask_tps)

    return [float(one(jax.random.PRNGKey(40_000 + r))) for r in range(reps)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--probes", type=int, nargs="+", default=[8, 30])
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--num-queries", type=int, default=32)
    ap.add_argument("--num-negatives", type=int, default=64)
    ap.add_argument("--out",
                    default="docs/artifacts/ref_parity/diag3d.json")
    args = ap.parse_args()

    import torch
    import torch.nn.functional as F
    from torch.nn.modules.loss import CrossEntropyLoss

    from arco_tpu.compat import refbridge as rb
    from arco_tpu.compat.torch_import import convert_vnet_state_dict
    m3 = rb.import_ref("model_3D")
    aug3 = rb.import_ref("augment_3d")
    lh = rb.import_ref("loss_helper")
    losses_mod = rb.import_ref("utils.losses")
    t3d = rb.import_ref("train_arco_3d")

    data = make_data(seed=0)
    img_l_all, lab_l_all, img_u_all, _, _ = data
    seed = 0
    torch.manual_seed(seed)
    np.random.seed(seed)

    model, fe_q, q_rep, random_pool = seeded_init_state_dicts(seed)
    ema_model = m3.create_model_3d(num_classes=K_CLS)
    ema_model.load_state_dict(model.state_dict())
    for p in ema_model.parameters():
        p.detach_()
    fe_k = m3.FeatureExtractor_3d(fea_dim=[128, 64, 32, 16, 16],
                                  output_dim=FEAT)
    with torch.no_grad():
        for t_p, s_p in zip(fe_k.parameters(), fe_q.parameters()):
            t_p.data.copy_(s_p.data)
            t_p.requires_grad = False

    memobank, queue_ptrlis, queue_size = [], [], []
    for i in range(K_CLS):
        memobank.append([torch.randn(1, FEAT)])
        queue_size.append(30000)
        queue_ptrlis.append(torch.zeros(1, dtype=torch.long))
    queue_size[0] = 50000

    params = [p for p in model.parameters() if p.requires_grad]
    optimizer = torch.optim.SGD(
        params + list(q_rep.parameters()) + list(fe_q.parameters()),
        lr=BASE_LR, weight_decay=1e-4, momentum=0.9, nesterov=True)
    ce_loss = CrossEntropyLoss()
    dice_loss = losses_mod.DiceLoss(K_CLS)
    model.train()
    ema_model.train()

    batch_rng = np.random.RandomState(seed + 777)
    results = {"iters": args.iters, "probes": {}, "vol": VOL,
               "num_queries": args.num_queries,
               "num_negatives": args.num_negatives, "reps": args.reps}
    t0 = time.time()
    for it in range(args.iters):
        li = batch_rng.randint(0, len(img_l_all), B)
        ui = batch_rng.randint(0, len(img_u_all), B)
        train_l_data = torch.tensor(img_l_all[li][:, None])
        train_l_label = torch.tensor(lab_l_all[li])
        train_u_data = torch.tensor(img_u_all[ui][:, None])

        with torch.no_grad():
            pred_u_t0, _, _ = ema_model(train_u_data)
        pseudo_logits, pseudo_labels = torch.max(
            torch.softmax(pred_u_t0, dim=1), dim=1)
        u_aug_data, u_aug_label, u_aug_logits = \
            aug3.generate_unsup_data_3d(train_u_data, pseudo_labels,
                                        pseudo_logits, mode="cutmix")
        with torch.no_grad():
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
        rep_teacher_all = torch.cat((rep_l_teacher, rep_u_teacher))

        loss_q = t3d.get_revisiting_loss(random_pool=random_pool,
                                         rep_u=rep_u,
                                         rep_u_teacher=rep_u_teacher,
                                         topk=TOPK)
        outputs_soft = torch.softmax(pred_l, dim=1)
        sup = (dice_loss(outputs_soft, train_l_label.unsqueeze(1))
               + ce_loss(pred_l, train_l_label.long()))
        unsup = t3d.compute_unsupervised_loss(pred_u, u_aug_label,
                                              u_aug_logits, 0.97)

        alpha_t = 20 * (1 - it / args.iters)
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

        if it in args.probes:
            inputs = {"rep_all": rep_all.detach(),
                      "label_l_1h": label_l_1h.long(),
                      "label_u_1h": label_u_1h.long(),
                      "prob_l_t": prob_l_teacher.detach(),
                      "prob_u_t": prob_u_teacher.detach(),
                      "low_mask_all": low_mask_all,
                      "high_mask_all": high_mask_all,
                      "rep_teacher_all": rep_teacher_all.detach()}
            print(f"[probe it={it}] bank sizes "
                  f"{[int(c[0].shape[0]) for c in memobank]}", flush=True)
            stats = probe_stats(inputs, memobank)
            rv = ref_reco_samples(lh, inputs, memobank, queue_ptrlis,
                                  queue_size, args.num_queries,
                                  args.num_negatives, reps=args.reps)
            av = arco_reco_samples(inputs, memobank, args.num_queries,
                                   args.num_negatives, reps=args.reps)
            params_m, stats_m = convert_vnet_state_dict(model.state_dict())
            mask = torch.ones(torch.cat((train_l_label, u_aug_label)).shape)
            labels_cat = torch.cat((train_l_label, u_aug_label), dim=0)
            logits_cat = torch.cat(
                (torch.ones_like(train_l_label).float(), u_aug_logits),
                dim=0)
            mask = torch.where(labels_cat == 0,
                               torch.zeros_like(mask), mask)
            mask = torch.where(logits_cat < 0.7, torch.zeros_like(mask),
                               mask).unsqueeze(1)
            images_cj2 = torch.cat((train_l_data, u_aug_data), dim=0)
            ev = eqv_samples(model, pred_all, images_cj2, mask,
                             reps=max(args.reps // 2, 3))
            aev = arco_eqv_samples(params_m, stats_m, pred_all, images_cj2,
                                   mask, reps=max(args.reps // 2, 3))
            results["probes"][str(it)] = {
                "class_stats": stats,
                "ref_reco": rv, "arco_reco": av,
                "ref_reco_mean": float(np.mean(rv)),
                "arco_reco_mean": float(np.mean(av)),
                "ref_eqv": ev, "arco_eqv": aev,
                "ref_eqv_mean": float(np.mean(ev)),
                "arco_eqv_mean": float(np.mean(aev))}
            print(json.dumps(results["probes"][str(it)], indent=1),
                  flush=True)
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
            with open(args.out, "w") as f:
                json.dump(results, f, indent=1)

        # the real update (mutates the bank exactly like the trajectory run)
        reco = lh.compute_contra_memobank_loss(
            rep_all, label_l_1h.long(), label_u_1h.long(),
            prob_l_teacher.detach(), prob_u_teacher.detach(),
            low_mask_all, high_mask_all, memobank, queue_ptrlis,
            queue_size, rep_teacher_all.detach(), delta_n=0.97,
            func="asmc", num_queries=args.num_queries,
            num_negatives=args.num_negatives)[-1]

        if it > 0:
            loss = 0.01 * reco + unsup + sup + loss_q
        else:
            loss = unsup + sup
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()
        with torch.no_grad():
            for p_e, p_s in zip(ema_model.parameters(),
                                model.parameters()):
                p_e.data = p_e.data * 0.99 + p_s.data * 0.01
        for g in optimizer.param_groups:
            g["lr"] = BASE_LR * (1.0 - it / args.iters) ** 0.9
        if (it + 1) % 5 == 0:
            print(f"[diag] iter {it + 1}/{args.iters} reco {float(reco):.4f}"
                  f" ({time.time() - t0:.0f}s)", flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
