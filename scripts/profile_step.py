"""Per-section timing of the ARCO 2D step on the current device.

Times isolated jitted pieces (model fwd/bwd, augs, contrastive, revisiting,
TPS-eqv, full step) to locate the hot spots. Run on TPU:

    python scripts/profile_step.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from arco_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

from arco_tpu.config import ArcoConfig
from arco_tpu.models import net_factory
from arco_tpu.train.arco2d import (init_arco_state, make_arco_modules,
                                   make_arco_step)
from arco_tpu.train.schedule import make_optimizer

HW, B, K = 256, 4, 4


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000  # ms


def main():
    dtype = jnp.bfloat16 if jax.devices()[0].platform != "cpu" else jnp.float32
    cfg = ArcoConfig()
    model = net_factory("unet", in_chns=1, class_num=K, dtype=dtype)
    modules = make_arco_modules(model, HW, HW, batch_size=B, dtype=dtype)
    tx = make_optimizer(0.01, 30000)
    state = init_arco_state(jax.random.PRNGKey(0), modules, cfg,
                            (B, HW, HW, 1), tx)

    rng = np.random.RandomState(0)
    label = rng.randint(0, K, size=(B, HW, HW)).astype(np.int32)
    image = jnp.asarray(label[..., None].astype(np.float32) / (K - 1))
    labels = jnp.asarray(label)

    variables = {"params": state.params["model"],
                 "batch_stats": state.batch_stats["model"]}

    @jax.jit
    def fwd(x):
        return model.apply(variables, x, train=True,
                           rngs={"dropout": jax.random.PRNGKey(0)},
                           mutable=["batch_stats"])[0][0]

    @jax.jit
    def fwd_bwd(x):
        def loss(v):
            logits, _, fmap = model.apply(
                {"params": v, "batch_stats": state.batch_stats["model"]},
                x, train=True, rngs={"dropout": jax.random.PRNGKey(0)},
                mutable=["batch_stats"])[0]
            return jnp.mean(logits.astype(jnp.float32) ** 2)
        return jax.grad(loss)(state.params["model"])

    print(f"model fwd          : {timeit(fwd, image):8.2f} ms")
    print(f"model fwd+bwd      : {timeit(fwd_bwd, image):8.2f} ms")

    @jax.jit
    def fusion(x):
        _, fmap = model.apply(variables, x, train=True,
                              rngs={"dropout": jax.random.PRNGKey(0)},
                              mutable=["batch_stats"])[0][0], None
        logits, _, fmap = model.apply(
            variables, x, train=True,
            rngs={"dropout": jax.random.PRNGKey(0)},
            mutable=["batch_stats"])[0]
        feat = modules.feature_extractor.apply(
            {"params": state.params["feature_extractor"]}, fmap)
        return modules.q_representation.apply(
            {"params": state.params["q_representation"]}, feat)

    print(f"fwd+fusion+rep     : {timeit(fusion, image):8.2f} ms")

    from arco_tpu.augment.mixing import generate_unsup_data
    from arco_tpu.augment.morph import adv_morph_batch
    from arco_tpu.augment.photometric import batch_photometric

    @jax.jit
    def augs(key, img, lab):
        d, t, l = generate_unsup_data(key, img, lab,
                                      jnp.ones(lab.shape), mode="cutmix",
                                      num_classes=K)
        d = batch_photometric(key, d)
        return adv_morph_batch(key, d)

    print(f"mix+photo+morph    : {timeit(augs, jax.random.PRNGKey(0), image, labels):8.2f} ms")

    from arco_tpu.losses.consistency import revisiting_loss
    rep_shape = (B, HW, HW, 496)
    rep_u = jnp.ones(rep_shape, dtype)
    rep_t = jnp.ones(rep_shape, dtype)

    @jax.jit
    def revisit(pool, a, b):  # pool as arg, not a 2.3GB captured constant
        return revisiting_loss(pool, a, b, topk=cfg.topk)

    print(f"revisiting loss    : "
          f"{timeit(revisit, state.random_pool, rep_u, rep_t):8.2f} ms")

    from arco_tpu.losses.contrastive import (compute_contra_memobank_loss,
                                             descending_rank)
    prob = jax.nn.softmax(jnp.asarray(
        rng.rand(2 * B, HW, HW, K).astype(np.float32)), -1)
    onehot = jax.nn.one_hot(jnp.concatenate([labels, labels]), K)
    is_lab = jnp.array([True] * B + [False] * B)
    mask = jnp.ones((2 * B, HW, HW))

    @jax.jit
    def contra(rep_all, rep_teacher, bank):
        rank = descending_rank(prob)
        return compute_contra_memobank_loss(
            jax.random.PRNGKey(0), rep_all, onehot, prob, rank, is_lab,
            onehot * is_lab[:, None, None, None], mask, mask, rep_teacher,
            bank, num_queries=cfg.num_queries,
            num_negatives=cfg.num_negatives,
            enqueue_per_class=cfg.memobank_enqueue)[1]

    rep_all = jnp.ones((2 * B, HW, HW, 496), dtype)
    print(f"contrastive loss   : {timeit(contra, rep_all, rep_all, state.memobank):8.2f} ms")

    @jax.jit
    def eqv(img):
        grid = modules.tps.reset(jax.random.PRNGKey(0))
        warped = modules.tps.apply(jnp.concatenate([img, img]), grid)
        pred = model.apply(variables, warped[:B], train=True,
                           rngs={"dropout": jax.random.PRNGKey(0)},
                           mutable=["batch_stats"])[0][0]
        return pred.sum()

    print(f"tps+fwd (eqv)      : {timeit(eqv, image):8.2f} ms")

    step_fn = make_arco_step(modules, cfg, tx, num_classes=K,
                             max_iterations=30000)
    batch = {"image_l": image, "label_l": labels, "image_u": image}

    def full(state):
        return step_fn(state, batch)

    state, _ = full(state)
    state, _ = full(state)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        state, m = full(state)
    jax.block_until_ready(m["loss"])
    print(f"FULL STEP          : {(time.perf_counter() - t0) / n * 1000:8.2f} ms")


if __name__ == "__main__":
    main()
