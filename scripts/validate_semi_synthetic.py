"""Method validation: ARCO semi-supervised vs supervised-only on synthetic
data with a tiny label budget.

Protocol (mirrors the reference's two-stage recipe — stage 2 always starts
from a pretrained checkpoint, train_arco_2d.py:223-226; cold-starting ARCO
from random weights feeds garbage pseudo-labels and hurts, as a first run
of this script confirmed: 0.380 vs 0.403 supervised):

  warmup: N_WARM supervised steps on the labeled slices (shared);
  arm (a): + N_TUNE more supervised-only steps;
  arm (b): + N_TUNE full-ARCO steps (pseudo-labels, cutmix, contrastive
      memobank, revisiting, TPS-eqv) from the warmup weights.

Reports held-out Dice for both arms at an equal total step budget. The
reference method's claim (arXiv:2302.01735) is (b) > (a) at small label
budgets; this verifies the TPU rebuild reproduces that behavior.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/validate_semi_synthetic.py
"""

import json
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


def make_task(rng, n):
    """Smooth blobs: image = sum of gaussians + noise; label = argmax of
    per-class blob fields (3 classes incl. background)."""
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
        stack = np.stack([0.6 * np.ones_like(yy)] + fields)  # bg threshold
        label = stack.argmax(0).astype(np.int32)
        image = (stack[1:].sum(0) / 2.0
                 + 0.2 * rng.randn(HW, HW)).astype(np.float32)
        images.append(image[..., None])
        labels.append(label)
    return np.stack(images), np.stack(labels)


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
    model = net_factory("unet", in_chns=1, class_num=K, dtype=dtype)
    modules = make_arco_modules(model, HW, HW, batch_size=B, dtype=dtype)
    tx = make_optimizer(0.01, steps)
    state = init_arco_state(jax.random.PRNGKey(0), modules, cfg,
                            (B, HW, HW, 1), tx,
                            model_params=init_params,
                            model_batch_stats=init_stats)
    step_fn = make_arco_step(modules, cfg, tx, num_classes=K,
                             max_iterations=steps)

    rng = np.random.RandomState(seed)
    t0 = time.time()
    for it in range(steps):
        li = rng.randint(0, len(img_l), B)
        ui = rng.randint(0, len(img_u), B)
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

    scores = []
    for i in range(0, len(img_val), B):
        chunk = img_val[i:i + B]
        if len(chunk) < B:
            chunk = np.concatenate([chunk, chunk[:B - len(chunk)]])
        preds = np.asarray(predict(jnp.asarray(chunk)))
        for j in range(min(B, len(img_val) - i)):
            scores.append(dice(preds[j], lab_val[i + j], K))
    return float(np.mean(scores))


def main():
    on_cpu = jax.devices()[0].platform == "cpu"
    dtype = jnp.float32 if on_cpu else jnp.bfloat16
    rng = np.random.RandomState(42)
    img_l, lab_l = make_task(rng, N_LABELED)
    img_u, _ = make_task(rng, N_UNLABELED)
    img_val, lab_val = make_task(rng, N_VAL)

    sup_cfg = ArcoConfig(compute_contrastive=False, compute_unsup=False,
                         compute_revisit=False, compute_eqv=False,
                         use_eqv_loss=False, use_photometric=False,
                         use_adv_morph=False)
    arco_cfg = ArcoConfig()

    warm_p, warm_s, model = run(sup_cfg, "warmup (supervised)", N_WARM,
                                img_l, lab_l, img_u, dtype)
    d_warm = evaluate(model, warm_p, warm_s, img_val, lab_val)
    print(f"warmup dice: {d_warm:.4f}", flush=True)

    p_a, s_a, m_a = run(sup_cfg, "arm a: +supervised ", N_TUNE, img_l,
                        lab_l, img_u, dtype, warm_p, warm_s, seed=1)
    d_sup = evaluate(m_a, p_a, s_a, img_val, lab_val)
    print(f"supervised-only dice: {d_sup:.4f}", flush=True)

    p_b, s_b, m_b = run(arco_cfg, "arm b: +full ARCO  ", N_TUNE, img_l,
                        lab_l, img_u, dtype, warm_p, warm_s, seed=1)
    d_arco = evaluate(m_b, p_b, s_b, img_val, lab_val)
    print(f"ARCO dice: {d_arco:.4f}", flush=True)

    print(json.dumps({"warmup_dice": round(d_warm, 4),
                      "supervised_dice": round(d_sup, 4),
                      "arco_dice": round(d_arco, 4),
                      "gain": round(d_arco - d_sup, 4)}))


if __name__ == "__main__":
    main()
