"""TPS spatial-transformer classification demo (optional example).

Parity target: the self-contained tps_stn_pytorch MNIST suite
(code/tps_stn_pytorch/mnist_train.py etc.) — not wired into ARCO's main
path (SURVEY §2.4); this example shows the same idea with the framework's
TPS machinery: a small CNN predicts control-point offsets, TPSGridGen turns
them into a sampling grid, and a classifier consumes the unwarped image.

Runs on synthetic digits (no dataset download in this environment):

    PYTHONPATH=. python examples/tps_mnist_demo.py --steps 100
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from arco_tpu.augment.tps import (TPSGridGen, default_control_points,
                                  make_rand_tps_grid)
from arco_tpu.ops.interpolate import grid_sample_2d


def synthetic_digits(rng, n, size=28):
    """Digit-like glyphs: class = number of bars."""
    images = np.zeros((n, size, size, 1), np.float32)
    labels = rng.randint(0, 4, size=n)
    for i, k in enumerate(labels):
        for b in range(k + 1):
            r = 4 + b * 6
            images[i, r:r + 3, 4:-4, 0] = 1.0
    return images, labels.astype(np.int32)


class STNClassifier(nn.Module):
    num_classes: int = 4
    grid_hw: int = 28

    def setup(self):
        self.gridgen = TPSGridGen(self.grid_hw, self.grid_hw,
                                  default_control_points())
        self.loc1 = nn.Conv(16, (5, 5), strides=(2, 2))
        self.loc2 = nn.Conv(32, (5, 5), strides=(2, 2))
        self.loc_out = nn.Dense(25 * 2)
        self.cls1 = nn.Conv(32, (3, 3))
        self.cls2 = nn.Dense(self.num_classes)

    def __call__(self, x):
        h = nn.relu(self.loc1(x))
        h = nn.relu(self.loc2(h))
        offsets = self.loc_out(h.reshape(h.shape[0], -1))
        cps = jnp.asarray(default_control_points())[None] \
            + 0.1 * jnp.tanh(offsets.reshape(-1, 25, 2))
        grid = self.gridgen(cps)
        warped = grid_sample_2d(x, grid, padding_mode="border")
        h = nn.relu(self.cls1(warped))
        h = jnp.mean(h, axis=(1, 2))
        return self.cls2(h), warped


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch", type=int, default=32)
    args = p.parse_args()

    rng = np.random.RandomState(0)
    model = STNClassifier()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 28, 28, 1)))

    import optax
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    gridgen = TPSGridGen(28, 28, default_control_points())

    @jax.jit
    def step(params, opt_state, images, labels):
        def loss_fn(p):
            logits, _ = model.apply(p, images)
            onehot = jax.nn.one_hot(labels, 4)
            return -jnp.mean(jnp.sum(
                onehot * jax.nn.log_softmax(logits), axis=-1))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(1)
    for it in range(args.steps):
        images, labels = synthetic_digits(rng, args.batch)
        # warp the inputs with a random TPS so the STN has work to undo
        key, k = jax.random.split(key)
        grid = make_rand_tps_grid(k, gridgen, args.batch, sigma=0.05)
        images = np.asarray(grid_sample_2d(jnp.asarray(images), grid,
                                           padding_mode="zeros"))
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(images),
                                       jnp.asarray(labels))
        if (it + 1) % 20 == 0:
            print(f"step {it + 1}: loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
