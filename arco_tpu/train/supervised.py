"""Plain supervised trainer (CE + Dice) — the baseline slice of SURVEY §7.2
step 2, also used by benchmarks to isolate backbone throughput."""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from arco_tpu.losses.supervised import cross_entropy, dice_loss


class SupervisedState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jnp.ndarray
    step: jnp.ndarray


def init_supervised_state(rng, model, tx, input_shape) -> SupervisedState:
    k_params, k_state = jax.random.split(rng)
    variables = model.init({"params": k_params,
                            "dropout": jax.random.PRNGKey(0)},
                           jnp.zeros(input_shape, jnp.float32), train=True)
    return SupervisedState(params=variables["params"],
                           batch_stats=variables.get("batch_stats", {}),
                           opt_state=tx.init(variables["params"]),
                           rng=k_state, step=jnp.array(0, jnp.int32))


def make_supervised_step(model, tx, num_classes: int):
    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        (logits, _, _), mutated = model.apply(
            variables, batch["image"], train=True, rngs={"dropout": rng},
            mutable=["batch_stats"])
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        ce = cross_entropy(logits, batch["label"])
        dl = dice_loss(probs, batch["label"], num_classes)
        loss = ce + dl
        return loss, (mutated.get("batch_stats", {}),
                      {"loss": loss, "loss_ce": ce, "loss_dice": dl})

    def step_fn(state: SupervisedState, batch):
        rng, k = jax.random.split(state.rng)
        (loss, (new_bs, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch, k)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return SupervisedState(params=params, batch_stats=new_bs,
                               opt_state=opt_state, rng=rng,
                               step=state.step + 1), metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_predict_fn(model, output: str = "argmax"):
    """Jitted inference: [B, *S, C] -> argmax labels or softmax probs."""

    @jax.jit
    def predict(params_and_stats, x):
        params, batch_stats = params_and_stats
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        logits, _, _ = model.apply(variables, x, train=False,
                                   rngs={"dropout": jax.random.PRNGKey(0)})
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        if output == "argmax":
            return jnp.argmax(probs, axis=-1).astype(jnp.int32)
        return probs

    return predict
