"""Stage-1 (ISD pretrain) leg of the reference-parity harness (VERDICT r4
item 7): drive the REFERENCE'S OWN torch pretrain loop — model_2D.ISD
(queues, patch-grid heads, EMA-inside-forward, ShuffleBN) composed exactly
as pretrain_2D.py:208-259 — for a multi-hundred-iteration run on CPU,
against arco_tpu.train.pretrain at a matched configuration from IDENTICAL
initial weights (converted via compat.torch_import).

Matched protocol knobs (both arms, documented deltas from the reference
defaults):
 - image size 128^2 with cut_size 64 -> a 3x3 patch grid (P=9). The
   reference hardcodes its queue_mask buffer to 49 patches for 256^2
   (model_2D.py:170); the harness re-registers that buffer at [K, 9, C*64]
   so the reference forward (which reads shapes dynamically) runs verbatim
   at the reduced size tractable on this 1-core host.
 - combinations=0 (identity weak/strong combo for both streams). The
   reference default 2 routes the teacher batch through PIL
   ColorJitter/GaussianBlur (pretrain_2D.py:137,210-225); the ARCO-stage 2D
   harness already exercises that PIL path; excluding it here removes the
   CPU-PIL RNG confounder from the distillation comparison.
 - T_s = T_t = 0.1, k1 = k2 = 1, batch 4 (2 labeled + 2 unlabeled), K=36,
   plain SGD momentum 0.9 wd 1e-4 (NO nesterov — pretrain_2D.py:196-197),
   poly^0.9 LR.

Named intentional rebuild deltas this harness quantifies (train/pretrain.py
docstring): no ShuffleBN (single-program BN is order-invariant), no unused
pre-update teacher forward, and CLEAN-AXES patch-descriptor similarity
logits where the reference's cat/reshape chain (model_2D.py:270-296)
reinterprets [P*B,...] memory as [B,P,...] and correlates 49-dim
patch-axis vectors; the loss_output magnitudes are therefore expected to
differ in value but must land at the same order and both arms must train
(CE/Dice falling, end Dice comparable).

    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python \
        scripts/pretrain_trajectory.py --iters 250 \
        --out docs/artifacts/ref_parity
"""

import argparse
import json
import os
import time

import numpy as np

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

HW = 128
K_CLS = 4
B = 4
LABELED_BS = 2
N_LABELED, N_UNLABELED, N_VAL = 8, 120, 16
BASE_LR = 0.01
QUEUE_K = 36
CUT = 64
POOL = 8
LATENT_F = 512
TS = TT = 0.1


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
    return (imgs[:N_LABELED], labs[:N_LABELED],
            imgs[N_LABELED:N_LABELED + N_UNLABELED],
            labs[N_LABELED:N_LABELED + N_UNLABELED],
            imgs[-N_VAL:], labs[-N_VAL:])


def fg_dice(pred, label):
    scores = []
    for c in range(1, K_CLS):
        p, l = pred == c, label == c
        denom = p.sum() + l.sum()
        if denom:
            scores.append(2.0 * (p & l).sum() / denom)
    return float(np.mean(scores)) if scores else 1.0


def build_ref_isd(seed):
    """Reference ISD at the harness size; queue_mask re-registered for the
    3x3 patch grid (queue shapes are read dynamically in forward)."""
    import torch
    import torch.nn.functional as F
    from arco_tpu.compat import refbridge as rb
    m2 = rb.import_ref("model_2D")
    torch.manual_seed(seed)
    isd = m2.ISD(K=QUEUE_K, m=0.99, Ts=TS, Tt=TT, num_classes=K_CLS,
                 latent_pooling_size=1, latent_feature_size=LATENT_F,
                 output_pooling_size=POOL, patch_size=CUT)
    p = ((HW - CUT) // (CUT // 2) + 1) ** 2
    qm = torch.randn(QUEUE_K, p, K_CLS * POOL ** 2)
    isd.register_buffer("queue_mask", F.normalize(qm, dim=0))
    return isd


def run_reference(iters, seed, data):
    import torch
    from torch.nn.modules.loss import CrossEntropyLoss

    from arco_tpu.compat import refbridge as rb
    rb.patch_cuda()
    losses_mod = rb.import_ref("utils.losses")
    pre2d = rb.import_ref("pretrain_2D")

    img_l, lab_l, img_u, lab_u, img_v, lab_v = data
    torch.manual_seed(seed)
    np.random.seed(seed)
    isd = build_ref_isd(0)           # arm-shared init seed
    params = [p for p in isd.parameters() if p.requires_grad]
    optimizer = torch.optim.SGD(params, lr=BASE_LR, momentum=0.9,
                                weight_decay=1e-4)
    ce_loss = CrossEntropyLoss()
    dice_loss = losses_mod.DiceLoss(K_CLS)
    kld = pre2d.KLD()
    isd.train()

    batch_rng = np.random.RandomState(seed + 777)
    rec = {k: [] for k in ("loss", "ce", "dice", "latent", "output")}
    t0 = time.time()
    for it in range(iters):
        li = batch_rng.randint(0, len(img_l), LABELED_BS)
        ui = batch_rng.randint(0, len(img_u), B - LABELED_BS)
        images = np.concatenate([img_l[li], img_u[ui]])[:, None]
        labels = np.concatenate([lab_l[li], lab_u[ui]])
        student_batch = torch.tensor(images, dtype=torch.float32)
        teacher_batch = student_batch            # combinations=0
        student_label = torch.tensor(labels)

        outputs, _ema_out, ema_latent_logits, latent_logits, \
            ema_output_logits, output_logits = isd(student_batch,
                                                   teacher_batch)
        outputs_soft = torch.softmax(outputs, dim=1)
        loss_ce = ce_loss(outputs[:LABELED_BS],
                          student_label[:LABELED_BS].long())
        loss_dice = dice_loss(outputs_soft[:LABELED_BS],
                              student_label[:LABELED_BS].unsqueeze(1))
        loss_latent = kld(inputs=latent_logits, targets=ema_latent_logits)
        loss_output = kld(inputs=output_logits, targets=ema_output_logits)
        loss = (loss_dice + loss_ce) + loss_latent + loss_output
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()
        lr_ = BASE_LR * (1.0 - it / iters) ** 0.9
        for g in optimizer.param_groups:
            g["lr"] = lr_

        for k, v in (("loss", loss), ("ce", loss_ce), ("dice", loss_dice),
                     ("latent", loss_latent), ("output", loss_output)):
            rec[k].append(float(v.detach()))
        if (it + 1) % 10 == 0:
            print(f"[ref-pre seed{seed}] iter {it + 1}/{iters} "
                  f"loss {rec['loss'][-1]:.4f} "
                  f"lat {rec['latent'][-1]:.4f} "
                  f"out {rec['output'][-1]:.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    isd.eval()
    with torch.no_grad():
        preds = []
        for i in range(len(img_v)):
            out, _ = isd(torch.tensor(img_v[i][None, None],
                                      dtype=torch.float32), None)
            preds.append(out.argmax(1)[0].numpy())
    dice = float(np.mean([fg_dice(p, l) for p, l in zip(preds, lab_v)]))
    return rec, dice, time.time() - t0


def run_arco(iters, seed, data):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from arco_tpu.compat.torch_import import (
        convert_latent_mlp_state_dict, convert_latent_predictor_state_dict,
        convert_outputs_predictor_state_dict,
        convert_projection_head_state_dict, convert_unet_state_dict)
    from arco_tpu.config import ISDConfig
    from arco_tpu.models import net_factory
    from arco_tpu.train.pretrain import (init_pretrain_state,
                                         make_isd_modules,
                                         make_pretrain_step)
    from arco_tpu.train.schedule import make_optimizer

    img_l, lab_l, img_u, lab_u, img_v, lab_v = data
    ref = build_ref_isd(0)
    params_m, stats_m = convert_unet_state_dict(ref.model.state_dict())
    p_qlat = convert_latent_mlp_state_dict(ref.q_latent_head.state_dict())
    p_klat = convert_latent_mlp_state_dict(ref.k_latent_head.state_dict())
    p_lpred = convert_latent_predictor_state_dict(
        ref.latent_predictor.state_dict())
    p_qout = convert_projection_head_state_dict(
        ref.q_outputs_head.state_dict())
    p_kout = convert_projection_head_state_dict(
        ref.k_outputs_head.state_dict())
    p_opred = convert_outputs_predictor_state_dict(
        ref.outputs_predictor.state_dict())
    queue0 = jnp.asarray(ref.queue.numpy())
    queue_mask0 = jnp.asarray(ref.queue_mask.numpy())

    cfg = ISDConfig(K=QUEUE_K, Ts=TS, Tt=TT, patch_size=CUT,
                    output_pooling_size=POOL, latent_feature_size=LATENT_F,
                    combinations=0)
    model = net_factory("unet", in_chns=1, class_num=K_CLS)
    modules = make_isd_modules(model, num_classes=K_CLS,
                               latent_feature_size=LATENT_F,
                               latent_pooling_size=1,
                               output_pooling_size=POOL)
    state = init_pretrain_state(jax.random.PRNGKey(seed), modules, cfg,
                                (B, HW, HW, 1), iters)
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    params = {"model": params_m, "latent_head": p_qlat,
              "latent_predictor": p_lpred, "outputs_head": p_qout,
              "outputs_predictor": p_opred}
    ema_params = {"model": copy(params_m), "latent_head": p_klat,
                  "outputs_head": p_kout}
    tx = make_optimizer(BASE_LR, iters, nesterov=False)
    state = state._replace(
        params=params, ema_params=ema_params,
        batch_stats={"model": stats_m},
        ema_batch_stats={"model": copy(stats_m)},
        queue=queue0.astype(state.queue.dtype),
        queue_mask=queue_mask0.astype(state.queue_mask.dtype),
        opt_state=tx.init(params))
    step_fn = make_pretrain_step(modules, cfg, tx, LABELED_BS, K_CLS)

    batch_rng = np.random.RandomState(seed + 777)
    rec = {k: [] for k in ("loss", "ce", "dice", "latent", "output")}
    names = {"loss": "loss", "ce": "loss_ce", "dice": "loss_dice",
             "latent": "loss_latent", "output": "loss_output"}
    t0 = time.time()
    for it in range(iters):
        li = batch_rng.randint(0, len(img_l), LABELED_BS)
        ui = batch_rng.randint(0, len(img_u), B - LABELED_BS)
        images = np.concatenate([img_l[li], img_u[ui]])[..., None]
        labels = np.concatenate([lab_l[li], lab_u[ui]])
        batch = {"student_image": jnp.asarray(images, jnp.float32),
                 "teacher_image": jnp.asarray(images, jnp.float32),
                 "label": jnp.asarray(labels)}
        state, metrics = step_fn(state, batch)
        for k, mk in names.items():
            rec[k].append(float(metrics[mk]))
        if (it + 1) % 10 == 0:
            print(f"[arco-pre seed{seed}] iter {it + 1}/{iters} "
                  f"loss {rec['loss'][-1]:.4f} "
                  f"lat {rec['latent'][-1]:.4f} "
                  f"out {rec['output'][-1]:.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    variables = {"params": state.params["model"],
                 "batch_stats": state.batch_stats["model"]}
    predict = jax.jit(lambda x: jnp.argmax(model.apply(
        variables, x, train=False,
        rngs={"dropout": jax.random.PRNGKey(0)})[0], -1))
    preds = [np.asarray(predict(jnp.asarray(
        img_v[i][None, ..., None], jnp.float32)))[0]
        for i in range(len(img_v))]
    dice = float(np.mean([fg_dice(p, l) for p, l in zip(preds, lab_v)]))
    return rec, dice, time.time() - t0


def window_means(rec, frac=0.25):
    n = len(rec["loss"])
    w = max(int(n * frac), 1)
    return {k: float(np.mean(v[-w:])) for k, v in rec.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=250)
    ap.add_argument("--ref-seeds", type=int, nargs="*", default=[0, 1])
    ap.add_argument("--arco-seeds", type=int, nargs="*", default=[0, 1])
    ap.add_argument("--out", default="docs/artifacts/ref_parity")
    ap.add_argument("--tag", default="pretrain_trajectory")
    args = ap.parse_args()

    data = make_data(seed=0)
    results = {"iters": args.iters, "hw": HW, "num_classes": K_CLS,
               "batch": [LABELED_BS, B - LABELED_BS], "K": QUEUE_K,
               "cut_size": CUT, "Ts": TS, "Tt": TT,
               "combinations": 0, "ref": [], "arco": []}

    def dump():
        os.makedirs(args.out, exist_ok=True)
        with open(os.path.join(args.out, f"{args.tag}.json"), "w") as f:
            json.dump(results, f, indent=1)

    for s in args.ref_seeds:
        rec, dice, wall = run_reference(args.iters, s, data)
        results["ref"].append({"seed": s, "dice": dice, "wall_s": wall,
                               "late_means": window_means(rec),
                               "curve_loss": rec["loss"]})
        print(f"[ref-pre seed{s}] dice {dice:.4f} wall {wall:.0f}s",
              flush=True)
        dump()
    for s in args.arco_seeds:
        rec, dice, wall = run_arco(args.iters, s, data)
        results["arco"].append({"seed": s, "dice": dice, "wall_s": wall,
                                "late_means": window_means(rec),
                                "curve_loss": rec["loss"]})
        print(f"[arco-pre seed{s}] dice {dice:.4f} wall {wall:.0f}s",
              flush=True)
        dump()

    print(json.dumps({
        "ref_dice": [r["dice"] for r in results["ref"]],
        "arco_dice": [r["dice"] for r in results["arco"]],
        "ref_late": [r["late_means"] for r in results["ref"]],
        "arco_late": [r["late_means"] for r in results["arco"]]}, indent=1))


if __name__ == "__main__":
    main()
