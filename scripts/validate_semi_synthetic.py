"""Falsifiable method-quality gate: ARCO semi-supervised vs supervised-only
on a synthetic task HARD enough that supervised-only at the label budget
lands well below ceiling (VERDICT r2 item 2).

Protocol (mirrors the reference's two-stage recipe — stage 2 always starts
from a pretrained checkpoint, train_arco_2d.py:223-226; cold-starting ARCO
from random weights feeds garbage pseudo-labels and hurts):

  warmup: N_WARM supervised steps on the labeled slices (shared);
  arm (a): + N_TUNE more supervised-only steps;
  arm (b): + N_TUNE full-ARCO steps (pseudo-labels, cutmix, contrastive
      memobank, revisiting, TPS-eqv) from the warmup weights.

Tasks:
  blobs    — the round-2 task (smooth gaussian blobs, same appearance
             everywhere). Saturates: both arms reach ceiling; kept for
             machinery checks.
  shifted  — the gate task. Class identity is carried by intensity level,
             and every image gets a random appearance shift (global gain,
             offset, smooth multiplicative bias field, noise). The labeled
             images are pinned at the canonical appearance (gain 1, offset
             0); unlabeled and validation span the full range. Two labeled
             images cannot teach appearance invariance, so supervised-only
             degrades off-canon; the ARCO recipe must recover it from the
             unlabeled stream (pseudo-label bootstrapping + photometric
             strong aug + cutmix consistency — the paper's mechanism). If
             reco/unsup/eqv/revisit were silently broken the (b)-(a) gap
             collapses — this is the number that moves.

Reports held-out Dice for both arms at an equal total step budget across
seeds and writes a JSON artifact; tests/test_quality_gate.py pins the
committed artifact's gap.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/validate_semi_synthetic.py \
        --task shifted --seeds 0 1 2 --out docs/artifacts/quality_gate
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from arco_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

import dataclasses

from arco_tpu.config import ArcoConfig
from arco_tpu.models import net_factory
from arco_tpu.train.arco2d import (init_arco_state, make_arco_modules,
                                   make_arco_step)
from arco_tpu.train.schedule import make_optimizer

HW, B, K = 256, 4, 3
N_LABELED, N_UNLABELED, N_VAL = 2, 128, 32
N_WARM, N_TUNE = 150, 450
# 3D gate arm (VERDICT r3 item 4): LA-shaped volumes, >= 3 classes so the
# volumetric contrastive reco term is NONZERO (the 2-class LA quirk makes
# reco == 0 identically, tests/test_losses.py), V-Net + the 3D trainer's
# module config at the reference's 2+2 batch split
VOL, B3_L, B3 = (64, 64, 32), 2, 4


def make_task(rng, n):
    """Round-2 task: smooth blobs, uniform appearance (saturates)."""
    xs = np.linspace(-1, 1, HW)
    yy, xx = np.meshgrid(xs, xs, indexing="ij")
    images, labels = [], []
    for _ in range(n):
        fields = []
        for c in range(K - 1):
            f = np.zeros((HW, HW), np.float32)
            for _ in range(3):
                cx, cy = rng.uniform(-0.7, 0.7, 2)
                s = rng.uniform(0.08, 0.25)
                f += np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s))
            fields.append(f)
        stack = np.stack([0.6 * np.ones_like(yy)] + fields)
        label = stack.argmax(0).astype(np.int32)
        image = (stack[1:].sum(0) / 2.0
                 + 0.2 * rng.randn(HW, HW)).astype(np.float32)
        images.append(image[..., None])
        labels.append(label)
    return np.stack(images), np.stack(labels)


def _bias_field(rng, hw, strength):
    """Smooth multiplicative field in [1-s, 1+s] from a coarse grid."""
    coarse = rng.uniform(-1.0, 1.0, (4, 4)).astype(np.float32)
    z = jax.image.resize(jnp.asarray(coarse), (hw, hw), "bicubic")
    return 1.0 + strength * np.asarray(z)


# One-sided shift: gains >= 1 only. The two-sided range was diagnosed on
# chip (docs/artifacts/quality_gate): below gain 1 the class-level
# separation shrinks against fixed noise (SNR drops), pseudo-labels start
# wrong and consistency training entrenches them (sup 0.138 -> arco 0.015
# in the dimmest bucket) while the bright side improved 0.695 -> 0.954.
# Brighter-only keeps SNR >= canon everywhere, so bootstrapping can chain
# outward; supervised-only still fails off-canon because gain 1.5 maps the
# class-1 level (0.62 -> 0.93) onto class-2's canonical 0.88.
GAIN_LO, GAIN_HI, OFF_MAX = 1.0, 1.5, 0.10


def make_task_shifted(rng, n, gains=None, offsets=None):
    """Gate task: intensity-coded classes + per-image appearance shift.

    Canonical appearance: background 0.35, class-1 blobs 0.62, class-2
    blobs 0.88 (separated by ~2x the noise sigma). Shift: image ->
    clip(gain * bias_field * base + offset + noise), gain U[GAIN_LO,
    GAIN_HI], offset U[-OFF_MAX, OFF_MAX] unless pinned via ``gains``/
    ``offsets``. The range is calibrated to the strong-aug bridge
    (photometric brightness/contrast 0.75-1.25): consistency training can
    chain invariance across the distribution, while two canonical labeled
    images cannot teach it — wider ranges turn the task partially
    ill-posed (gain maps one class level onto another) and both arms
    collapse together.
    """
    xs = np.linspace(-1, 1, HW)
    yy, xx = np.meshgrid(xs, xs, indexing="ij")
    levels = np.array([0.35, 0.62, 0.88], np.float32)
    images, labels = [], []
    for i in range(n):
        fields = []
        for c in range(K - 1):
            f = np.zeros((HW, HW), np.float32)
            for _ in range(3):
                cx, cy = rng.uniform(-0.7, 0.7, 2)
                s = rng.uniform(0.10, 0.28)
                f += np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s))
            fields.append(f)
        stack = np.stack([0.55 * np.ones_like(yy)] + fields)
        label = stack.argmax(0).astype(np.int32)
        base = levels[label]
        gain = (gains[i] if gains is not None
                else rng.uniform(GAIN_LO, GAIN_HI))
        offset = (offsets[i] if offsets is not None
                  else rng.uniform(-OFF_MAX, OFF_MAX))
        field = _bias_field(rng, HW, 0.10)
        image = np.clip(gain * field * base + offset
                        + 0.13 * rng.randn(HW, HW), 0.0, 1.5)
        images.append(image.astype(np.float32)[..., None])
        labels.append(label)
    return np.stack(images), np.stack(labels)


def make_task_striped(rng, n, thetas=None):
    """Gate task 'striped': orientation-coded texture classes.

    Both foreground classes are sinusoidal stripe textures with the SAME
    mean intensity as the background (0.5) — intensity thresholding is
    useless; classes differ by stripe FREQUENCY (period 16 px vs 6 px) and
    every image draws one stripe orientation theta. The labeled set is
    pinned at theta=0; unlabeled/val span [0, 90] degrees. A conv net
    trained on two theta=0 images cannot generalize across orientation;
    the ARCO recipe can — its TPS-equivariance warp rotates by up to
    ±60 degrees (rand_tps.py:64, _similarity_theta) and cutmix +
    pseudo-label consistency chain the invariance outward. A broken
    eqv/unsup/contrastive path collapses the (b)-(a) gap.
    """
    xs = np.linspace(-1, 1, HW)
    yy, xx = np.meshgrid(xs, xs, indexing="ij")
    periods = {1: 16.0, 2: 6.0}      # in pixels
    images, labels = [], []
    for i in range(n):
        fields = []
        for c in range(K - 1):
            f = np.zeros((HW, HW), np.float32)
            for _ in range(3):
                cx, cy = rng.uniform(-0.7, 0.7, 2)
                s = rng.uniform(0.12, 0.30)
                f += np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s))
            fields.append(f)
        stack = np.stack([0.55 * np.ones_like(yy)] + fields)
        label = stack.argmax(0).astype(np.int32)
        theta = (thetas[i] if thetas is not None
                 else rng.uniform(0.0, 90.0)) * np.pi / 180.0
        px = (xx * np.cos(theta) + yy * np.sin(theta)) * (HW / 2)
        image = np.full((HW, HW), 0.5, np.float32)
        for c, period in periods.items():
            tex = 0.5 + 0.3 * np.sin(2 * np.pi * px / period)
            image = np.where(label == c, tex, image)
        image = np.clip(image + 0.12 * rng.randn(HW, HW), 0.0, 1.5)
        images.append(image.astype(np.float32)[..., None])
        labels.append(label)
    return np.stack(images), np.stack(labels)


NOISE3D, LABELED3D = 0.22, 4


def make_task_noisy3d(rng, n, sigma=None):
    """3D gate task matched to the 3D method's ACTUAL mechanism set.

    The reference's volumetric ARCO has NO photometric bridge — its 3D
    batch_transform is a passthrough (augment_3d.py:209-226) and AdvMorph
    is 2D-only — so the appearance-shift ('shifted') mechanism cannot work
    there: pseudo-labels start wrong off-canon and cutmix consistency
    entrenches them (measured: quality_gate_shifted3d run, mean gain
    -0.012, worst seed -0.066 — the same confirmation-bias mode as the 2D
    cal1/cal2 history). What the 3D recipe DOES provide is label
    amplification: EMA-teacher pseudo-labels + cutmix consistency over
    the unlabeled stream regularize decision boundaries that a 2-volume
    labeled set cannot pin down. This task targets exactly that:
    canonical appearance everywhere, intensity-coded classes whose level
    gaps (~0.27) are comparable to the noise sigma (0.26), so per-voxel
    classification is unreliable and supervised-only overfits the two
    labeled volumes' noise realizations."""
    X, Y, Z = VOL
    xs = np.linspace(-1, 1, X)
    ys = np.linspace(-1, 1, Y)
    zz = np.linspace(-1, 1, Z)
    gx, gy, gz = np.meshgrid(xs, ys, zz, indexing="ij")
    levels = np.array([0.35, 0.62, 0.88], np.float32)
    images, labels = [], []
    for i in range(n):
        fields = []
        for c in range(K - 1):
            f = np.zeros(VOL, np.float32)
            for _ in range(3):
                cx, cy, cz = rng.uniform(-0.6, 0.6, 3)
                s = rng.uniform(0.15, 0.35)
                f += np.exp(-((gx - cx) ** 2 + (gy - cy) ** 2
                              + (gz - cz) ** 2) / (2 * s * s))
            fields.append(f)
        stack = np.stack([0.55 * np.ones(VOL, np.float32)] + fields)
        label = stack.argmax(0).astype(np.int32)
        image = np.clip(levels[label]
                        + (sigma or NOISE3D) * rng.randn(*VOL), 0.0, 1.5)
        images.append(image.astype(np.float32)[..., None])
        labels.append(label)
    return np.stack(images), np.stack(labels)


def make_task_shifted3d(rng, n, gains=None, offsets=None):
    """3D gate task: the 'shifted' mechanism on LA-shaped volumes.

    Intensity-coded classes (background 0.35 / class-1 0.62 / class-2
    0.88), per-volume appearance shift (gain, offset, smooth 3D bias
    field, noise); labeled volumes pinned at canonical appearance. Uses
    the SAME calibrated ranges as the 2D task — the photometric strong-aug
    bridge is shared by both trainers."""
    X, Y, Z = VOL
    zz = np.linspace(-1, 1, Z)
    xs = np.linspace(-1, 1, X)
    ys = np.linspace(-1, 1, Y)
    gx, gy, gz = np.meshgrid(xs, ys, zz, indexing="ij")
    levels = np.array([0.35, 0.62, 0.88], np.float32)
    images, labels = [], []
    for i in range(n):
        fields = []
        for c in range(K - 1):
            f = np.zeros(VOL, np.float32)
            for _ in range(3):
                cx, cy, cz = rng.uniform(-0.6, 0.6, 3)
                s = rng.uniform(0.15, 0.35)
                f += np.exp(-((gx - cx) ** 2 + (gy - cy) ** 2
                              + (gz - cz) ** 2) / (2 * s * s))
            fields.append(f)
        stack = np.stack([0.55 * np.ones(VOL, np.float32)] + fields)
        label = stack.argmax(0).astype(np.int32)
        base = levels[label]
        gain = (gains[i] if gains is not None
                else rng.uniform(GAIN_LO, GAIN_HI))
        offset = (offsets[i] if offsets is not None
                  else rng.uniform(-OFF_MAX, OFF_MAX))
        coarse = rng.uniform(-1.0, 1.0, (4, 4, 2)).astype(np.float32)
        field = 1.0 + 0.10 * np.asarray(
            jax.image.resize(jnp.asarray(coarse), VOL, "linear"))
        image = np.clip(gain * field * base + offset
                        + 0.13 * rng.randn(*VOL), 0.0, 1.5)
        images.append(image.astype(np.float32)[..., None])
        labels.append(label)
    return np.stack(images), np.stack(labels)


def make_data(task, seed):
    rng = np.random.RandomState(seed)
    if task == "noisy3d":
        # 4 labeled volumes (not the 2D gate's 2): a (64,64,32) volume
        # carries ~8x fewer voxels than a 256^2 slice pair, and 2-volume
        # labeled sets made task difficulty swing wildly across seeds
        # (warmup dice 0.50 vs 0.82 between seeds in the first run)
        img_l, lab_l = make_task_noisy3d(rng, LABELED3D)
        img_u, _ = make_task_noisy3d(rng, N_UNLABELED)
        img_v, lab_v = make_task_noisy3d(rng, N_VAL)
        return img_l, lab_l, img_u, img_v, lab_v
    if task == "shifted3d":
        img_l, lab_l = make_task_shifted3d(
            rng, N_LABELED, gains=np.ones(N_LABELED),
            offsets=np.zeros(N_LABELED))
        img_u, _ = make_task_shifted3d(rng, N_UNLABELED)
        val_gains = np.linspace(GAIN_LO, GAIN_HI, N_VAL)
        val_offsets = np.linspace(-OFF_MAX, OFF_MAX, N_VAL)
        rng.shuffle(val_offsets)
        img_v, lab_v = make_task_shifted3d(rng, N_VAL, gains=val_gains,
                                           offsets=val_offsets)
        return img_l, lab_l, img_u, img_v, lab_v
    if task == "striped":
        img_l, lab_l = make_task_striped(rng, N_LABELED,
                                         thetas=np.zeros(N_LABELED))
        img_u, _ = make_task_striped(rng, N_UNLABELED)
        val_thetas = np.linspace(0.0, 90.0, N_VAL)
        img_v, lab_v = make_task_striped(rng, N_VAL, thetas=val_thetas)
        return img_l, lab_l, img_u, img_v, lab_v
    if task == "blobs":
        img_l, lab_l = make_task(rng, N_LABELED)
        img_u, _ = make_task(rng, N_UNLABELED)
        img_v, lab_v = make_task(rng, N_VAL)
    else:
        # labeled pinned at canonical appearance; val stratified over the
        # full gain range so the score reflects the whole distribution
        img_l, lab_l = make_task_shifted(
            rng, N_LABELED, gains=np.ones(N_LABELED),
            offsets=np.zeros(N_LABELED))
        img_u, _ = make_task_shifted(rng, N_UNLABELED)
        val_gains = np.linspace(GAIN_LO, GAIN_HI, N_VAL)
        val_offsets = np.linspace(-OFF_MAX, OFF_MAX, N_VAL)
        rng.shuffle(val_offsets)
        img_v, lab_v = make_task_shifted(rng, N_VAL, gains=val_gains,
                                         offsets=val_offsets)
    return img_l, lab_l, img_u, img_v, lab_v


def dice(pred, label, num_classes):
    scores = []
    for c in range(1, num_classes):
        p, l = pred == c, label == c
        denom = p.sum() + l.sum()
        if denom == 0:
            continue
        scores.append(2.0 * (p & l).sum() / denom)
    return float(np.mean(scores)) if scores else 1.0


def run(cfg, tag, steps, img_l, lab_l, img_u, dtype, init_params=None,
        init_stats=None, seed=0):
    is3d = img_l.ndim == 5
    if is3d:
        # the 3D trainer's module config (cli/train_arco_3d.py:85-90)
        from arco_tpu.models import net_factory_3d
        b_l, b_u = B3_L, B3 - B3_L
        model = net_factory_3d("vnet", in_chns=1, class_num=K, dtype=dtype)
        modules = make_arco_modules(
            model, VOL[1], VOL[0], batch_size=b_l, total_batch=B3,
            feature_channels=(128, 64, 32, 16, 16), fused_dim=16,
            dtype=dtype)
        init_shape = (b_l,) + VOL + (1,)
    else:
        b_l = b_u = B
        model = net_factory("unet", in_chns=1, class_num=K, dtype=dtype)
        modules = make_arco_modules(model, HW, HW, batch_size=B, dtype=dtype)
        init_shape = (B, HW, HW, 1)
    tx = make_optimizer(0.01, steps)
    state = init_arco_state(jax.random.PRNGKey(seed), modules, cfg,
                            init_shape, tx,
                            model_params=init_params,
                            model_batch_stats=init_stats)
    step_fn = make_arco_step(modules, cfg, tx, num_classes=K,
                             max_iterations=steps)

    rng = np.random.RandomState(seed)
    t0 = time.time()
    for it in range(steps):
        li = rng.randint(0, len(img_l), b_l)
        ui = rng.randint(0, len(img_u), b_u)
        batch = {"image_l": jnp.asarray(img_l[li]),
                 "label_l": jnp.asarray(lab_l[li]),
                 "image_u": jnp.asarray(img_u[ui])}
        state, metrics = step_fn(state, batch)
    loss = float(metrics["loss"])
    dt = time.time() - t0
    print(f"{tag}: {steps} steps in {dt:.0f}s (final loss {loss:.4f})",
          flush=True)
    return (jax.device_get(state.params["model"]),
            jax.device_get(state.batch_stats["model"]), model)


def evaluate(model, params, stats, img_val, lab_val):
    @jax.jit
    def predict(x):
        variables = {"params": params}
        if stats:
            variables["batch_stats"] = stats
        logits, _, _ = model.apply(variables, x, train=False,
                                   rngs={"dropout": jax.random.PRNGKey(0)})
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    eb = B3_L if img_val.ndim == 5 else B
    scores = []
    for i in range(0, len(img_val), eb):
        chunk = img_val[i:i + eb]
        if len(chunk) < eb:
            chunk = np.concatenate([chunk, chunk[:eb - len(chunk)]])
        preds = np.asarray(predict(jnp.asarray(chunk)))
        for j in range(min(eb, len(img_val) - i)):
            scores.append(dice(preds[j], lab_val[i + j], K))
    return float(np.mean(scores))


def evaluate_buckets(model, params, stats, img_v, lab_v, n_buckets=4):
    """Per-gain-bucket dice: val is built with gains = linspace, so
    contiguous index ranges are gain bands (diagnosis: WHERE does an arm
    fail — near canon or at the shift extremes?)."""
    per = len(img_v) // n_buckets
    out = []
    for i in range(n_buckets):
        sl = slice(i * per, (i + 1) * per)
        out.append(round(evaluate(model, params, stats, img_v[sl],
                                  lab_v[sl]), 4))
    return out


def run_seed(task, seed, dtype, arms=("sup", "arco"), n_tune=N_TUNE,
             n_warm=N_WARM):
    img_l, lab_l, img_u, img_v, lab_v = make_data(task, seed)
    sup_cfg = ArcoConfig(compute_contrastive=False, compute_unsup=False,
                         compute_revisit=False, compute_eqv=False,
                         use_eqv_loss=False, use_photometric=False,
                         use_adv_morph=False)
    arco_cfg = ArcoConfig()
    if task in ("shifted3d", "noisy3d"):
        # the 3D trainer's method config (cli/train_arco_3d.py:40-62):
        # eqv logged but EXCLUDED from the loss (train_arco_3d.py:389-398
        # quirk), no photometric / adv-morph (the reference's 3D
        # batch_transform is a passthrough, augment_3d.py:209-226, and
        # AdvMorph is a 2D velocity-field warp), randn memobank rows
        # compute_eqv=False matches the SHIPPED 3D trainer's steady-state
        # step: cli/train_arco_3d.py defaults to eqv_on_log_only (round 5)
        # because the every-step eqv forward's only training effect is a
        # BN-stat nudge measured to hurt end Dice
        # (ref_parity/trajectory_3d_arco_noeqv.json)
        arco_cfg = dataclasses.replace(
            arco_cfg, use_eqv_loss=False, compute_eqv=False,
            use_photometric=False, use_adv_morph=False,
            memobank_init="randn")

    warm_p, warm_s, model = run(sup_cfg, f"[s{seed}] warmup", n_warm,
                                img_l, lab_l, img_u, dtype, seed=seed)
    out = {"seed": seed,
           "warmup_dice": evaluate(model, warm_p, warm_s, img_v, lab_v)}
    print(f"[s{seed}] warmup dice: {out['warmup_dice']:.4f}", flush=True)

    if "sup" in arms:
        p, s, m = run(sup_cfg, f"[s{seed}] arm a: +supervised", n_tune,
                      img_l, lab_l, img_u, dtype, warm_p, warm_s,
                      seed=seed + 1)
        out["supervised_dice"] = evaluate(m, p, s, img_v, lab_v)
        out["supervised_buckets"] = evaluate_buckets(m, p, s, img_v, lab_v)
        print(f"[s{seed}] supervised-only dice: "
              f"{out['supervised_dice']:.4f} "
              f"buckets={out['supervised_buckets']}", flush=True)
    if "arco" in arms:
        p, s, m = run(arco_cfg, f"[s{seed}] arm b: +full ARCO", n_tune,
                      img_l, lab_l, img_u, dtype, warm_p, warm_s,
                      seed=seed + 1)
        out["arco_dice"] = evaluate(m, p, s, img_v, lab_v)
        out["arco_buckets"] = evaluate_buckets(m, p, s, img_v, lab_v)
        print(f"[s{seed}] ARCO dice: {out['arco_dice']:.4f} "
              f"buckets={out['arco_buckets']}", flush=True)
    # per-term diagnostic arms (3D collapse triage): the full-ARCO cfg with
    # one method term disabled each — identifies WHICH term moves the arm
    term_arms = {
        "arco_nounsup": dict(compute_unsup=False),
        "arco_norevisit": dict(compute_revisit=False),
        "arco_noreco": dict(compute_contrastive=False),
        "arco_unsuponly": dict(compute_revisit=False,
                               compute_contrastive=False),
        # the beyond-parity mitigation: full ARCO with the unsup CE
        # confidence-masked (FixMatch-style, --arco.unsup_conf_mask)
        "arco_confmask": dict(unsup_conf_mask=True),
    }
    for arm, delta in term_arms.items():
        if arm not in arms:
            continue
        acfg = dataclasses.replace(arco_cfg, **delta)
        p, s, m = run(acfg, f"[s{seed}] arm {arm}", n_tune, img_l, lab_l,
                      img_u, dtype, warm_p, warm_s, seed=seed + 1)
        out[f"{arm}_dice"] = evaluate(m, p, s, img_v, lab_v)
        print(f"[s{seed}] {arm} dice: {out[f'{arm}_dice']:.4f}", flush=True)

    if "sup" in arms and "arco" in arms:
        out["gain"] = round(out["arco_dice"] - out["supervised_dice"], 4)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="shifted",
                    choices=["blobs", "shifted", "striped", "shifted3d",
                             "noisy3d"])
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--arms", nargs="+", default=["sup", "arco"])
    ap.add_argument("--tune-steps", type=int, default=N_TUNE)
    ap.add_argument("--warm-steps", type=int, default=N_WARM)
    ap.add_argument("--noise3d", type=float, default=None,
                    help="noisy3d noise sigma override (collapse-regime "
                         "triage used 0.26)")
    ap.add_argument("--labeled3d", type=int, default=None,
                    help="noisy3d labeled-volume count override")
    ap.add_argument("--out", default=None,
                    help="artifact dir; writes quality_gate.json")
    args = ap.parse_args()

    if args.noise3d is not None:
        globals()["NOISE3D"] = args.noise3d
    if args.labeled3d is not None:
        globals()["LABELED3D"] = args.labeled3d
    on_cpu = jax.devices()[0].platform == "cpu"
    dtype = jnp.float32 if on_cpu else jnp.bfloat16
    results = {"task": args.task, "hw": HW, "n_labeled": N_LABELED,
               "n_unlabeled": N_UNLABELED, "warm_steps": args.warm_steps,
               "tune_steps": args.tune_steps,
               "backend": jax.devices()[0].platform, "runs": []}
    if args.task in ("shifted3d", "noisy3d"):
        results["vol"] = list(VOL)
        results["batch"] = [B3_L, B3 - B3_L]
    if args.task == "noisy3d":
        results["noise_sigma"] = NOISE3D
        results["labeled_volumes"] = LABELED3D
        results["n_labeled"] = LABELED3D
    for s in args.seeds:
        results["runs"].append(run_seed(args.task, s, dtype,
                                        arms=tuple(args.arms),
                                        n_tune=args.tune_steps,
                                        n_warm=args.warm_steps))

    if all("gain" in r for r in results["runs"]):
        gains = [r["gain"] for r in results["runs"]]
        sups = [r["supervised_dice"] for r in results["runs"]]
        arcos = [r["arco_dice"] for r in results["runs"]]
        results["summary"] = {
            "mean_supervised": round(float(np.mean(sups)), 4),
            "mean_arco": round(float(np.mean(arcos)), 4),
            "mean_gain": round(float(np.mean(gains)), 4),
            "min_gain": round(float(np.min(gains)), 4)}
        print(json.dumps(results["summary"]))
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        # the shifted artifact keeps its committed name; other task
        # families get their own file so the gates accumulate
        name = ("quality_gate.json" if args.task == "shifted"
                else f"quality_gate_{args.task}.json")
        with open(os.path.join(args.out, name), "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.out}/{name}")
        # the confmask mitigation gate gets its OWN pinned-schema artifact
        # (tests/test_quality_gate.py FAMILIES['noisy3d_confmask']): the
        # confmask arm plays the 'arco' role, gain is vs supervised-only
        if all("arco_confmask_dice" in r and "supervised_dice" in r
               for r in results["runs"]):
            cm = dict(results)
            cm["task"] = f"{args.task}_confmask"
            cm["runs"] = [
                {"seed": r["seed"], "warmup_dice": r["warmup_dice"],
                 "supervised_dice": r["supervised_dice"],
                 "ref_formula_arco_dice": r.get("arco_dice"),
                 "arco_dice": r["arco_confmask_dice"],
                 "gain": round(r["arco_confmask_dice"]
                               - r["supervised_dice"], 4)}
                for r in results["runs"]]
            gains = [r["gain"] for r in cm["runs"]]
            cm["summary"] = {
                "mean_supervised": round(float(np.mean(
                    [r["supervised_dice"] for r in cm["runs"]])), 4),
                "mean_arco": round(float(np.mean(
                    [r["arco_dice"] for r in cm["runs"]])), 4),
                "mean_gain": round(float(np.mean(gains)), 4),
                "min_gain": round(float(np.min(gains)), 4)}
            cname = f"quality_gate_{args.task}_confmask.json"
            with open(os.path.join(args.out, cname), "w") as f:
                json.dump(cm, f, indent=1)
            print(f"wrote {args.out}/{cname}")


if __name__ == "__main__":
    main()
