"""Static-shape stratified Monte-Carlo samplers.

The paper's variance-reduction contribution is stratified (optionally
antithetic) sampling of contrastive anchors and negatives over the rank space
of valid pixels (reference: grid_monte_carlo_sample /
grid_as_monte_carlo_sample, loss_helper_3d.py:119-269 and
loss_helper.py:292-439). The reference builds Python lists with data-dependent
lengths; that cannot be jitted. This module re-expresses the samplers with
static output shapes:

- ``stratified_indices``: partitions [0, n) into ``num_samples`` equal strata
  and draws one uniform sample per stratum — the same estimator family with
  strictly finer stratification than the reference's cut_count^2 grid cells.
- ``antithetic_stratified_indices``: pairs of strata share one uniform draw
  mirrored about the pair center, matching the reference's antithetic pairs
  (loss_helper_3d.py:228-247: ``ano_picked_index = center - picked_index``).
- ``uniform_indices``: plain randint fallback (func != smc/asmc).
- ``sample_from_mask``: maps sampled *ranks* (positions within the sequence of
  valid pixels, raster order) back to flat array indices via a cumulative-sum
  search, replacing the reference's dynamic boolean-mask gather
  (loss_helper_3d.py:375-377) with a fixed-size masked op.

``n`` may be a traced scalar; all outputs have static shapes. When n == 0 the
indices are meaningless — callers must gate on the returned validity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def uniform_indices(key, n, num_samples: int):
    """num_samples uniform draws from [0, max(n,1))."""
    n = jnp.maximum(n, 1)
    u = jax.random.uniform(key, (num_samples,))
    return jnp.minimum((u * n).astype(jnp.int32), n - 1)


def stratified_indices(key, n, num_samples: int, shuffle: bool = True):
    """Stratified draws: one uniform sample in each of num_samples strata of
    [0, n). Matches the reference 'smc' sampler's variance-reduction intent
    (grid_monte_carlo_sample) with static shapes."""
    n = jnp.maximum(n, 1)
    k_u, k_p = jax.random.split(key)
    u = jax.random.uniform(k_u, (num_samples,))
    pos = (jnp.arange(num_samples, dtype=jnp.float32) + u) / num_samples
    idx = jnp.minimum((pos * n).astype(jnp.int32), n - 1)
    if shuffle:
        idx = jax.random.permutation(k_p, idx)
    return idx


def antithetic_stratified_indices(key, n, num_samples: int,
                                  shuffle: bool = True):
    """Antithetic stratified draws ('asmc'): strata are processed in pairs;
    each pair draws one uniform offset t and uses (t, mirror(t)) about the
    pair center — the antithetic-pair construction of
    grid_as_monte_carlo_sample (loss_helper_3d.py:228-247)."""
    assert num_samples % 2 == 0, "antithetic sampling needs an even count"
    half = num_samples // 2
    n = jnp.maximum(n, 1)
    k_u, k_p = jax.random.split(key)
    t = jax.random.uniform(k_u, (half,)) * 2.0  # offset within the 2-stratum block
    base = 2.0 * jnp.arange(half, dtype=jnp.float32)
    pos_a = (base + t) / num_samples
    pos_b = (base + (2.0 - t)) / num_samples  # mirrored about block center
    pos = jnp.concatenate([pos_a, pos_b])
    idx = jnp.minimum((pos * n).astype(jnp.int32), n - 1)
    idx = jnp.clip(idx, 0, n - 1)
    if shuffle:
        idx = jax.random.permutation(k_p, idx)
    return idx


def draw_indices(key, n, num_samples: int, func: str = "smc",
                 shuffle: bool = True):
    """Dispatch on the reference's --func flag (train_arco_2d.py:78).

    The reference shuffles sampled indices (loss_helper_3d.py:165-169);
    permutation is a device sort, and callers whose loss is permutation-
    invariant (any CE/mean over the samples) should pass shuffle=False.
    """
    if func == "asmc":
        return antithetic_stratified_indices(key, n, num_samples,
                                             shuffle=shuffle)
    if func == "smc":
        return stratified_indices(key, n, num_samples, shuffle=shuffle)
    return uniform_indices(key, n, num_samples)


def ranks_to_flat(mask_flat: jnp.ndarray, ranks: jnp.ndarray):
    """Map ranks within the valid subsequence of ``mask_flat`` to flat indices.

    mask_flat: [M] bool; ranks: [S] int32 in [0, sum(mask)).
    Returns flat indices [S] into the original array, preserving the raster
    order the reference's ``rep[mask]`` gather produces.
    """
    csum = jnp.cumsum(mask_flat.astype(jnp.int32))
    # flat index of rank r = first position where csum == r+1
    return jnp.searchsorted(csum, ranks + 1, side="left").astype(jnp.int32)


def sample_from_mask(key, mask_flat: jnp.ndarray, num_samples: int,
                     func: str = "smc", shuffle: bool = False):
    """Sample flat indices of valid entries, stratified over the valid
    subsequence. Returns (indices [S], n_valid scalar)."""
    n = jnp.sum(mask_flat.astype(jnp.int32))
    ranks = draw_indices(key, n, num_samples, func=func, shuffle=shuffle)
    return ranks_to_flat(mask_flat, ranks), n
