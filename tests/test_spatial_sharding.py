"""Halo-exchange spatial sharding (parallel/spatial.py): a conv forward over
a depth-sharded volume must equal the unsharded forward (SURVEY §2.9
spatial-sharding stretch goal; 8-device virtual CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from arco_tpu.parallel import create_mesh
from arco_tpu.parallel.spatial import (shard_volume, sharded_volume_forward,
                                       _halo_pass, _crop)


class SmallConvNet(nn.Module):
    """3-layer 3D conv stack, receptive-field half-width = 3."""
    features: int = 8
    out: int = 2

    @nn.compact
    def __call__(self, x):
        for _ in range(3):
            x = nn.relu(nn.Conv(self.features, (3, 3, 3), padding="SAME")(x))
        return nn.Conv(self.out, (1, 1, 1))(x)


@pytest.fixture(scope="module")
def mesh():
    return create_mesh((4,), ("data",), devices=jax.devices()[:4])


def test_halo_exchange_matches_unsharded(mesh):
    key = jax.random.PRNGKey(0)
    model = SmallConvNet()
    vol = jax.random.normal(key, (1, 32, 8, 8, 1))
    variables = model.init(key, vol)
    want = model.apply(variables, vol)

    fwd = lambda x: model.apply(variables, x)
    halo = 4  # >= receptive-field half-width (3)
    sharded_call = sharded_volume_forward(fwd, mesh, halo=halo,
                                          spatial_axis=1)
    vol_sharded = shard_volume(vol, mesh, spatial_axis=1)
    got = sharded_call(vol_sharded)

    # Exactness contract: with halo >= receptive-field half-width the output
    # matches the unsharded forward everywhere except the global-edge band
    # of RF half-width (stacked SAME padding is not reproducible by any
    # fixed pre-extension — layer 2 sees relu(bias) in the extension where
    # the unsharded net sees fresh zero padding).
    rf = 3
    np.testing.assert_allclose(np.asarray(got)[:, rf:-rf],
                               np.asarray(want)[:, rf:-rf],
                               rtol=1e-5, atol=1e-5)
    # in particular the shard boundaries (depth 8, 16, 24) are seamless
    for b in (8, 16, 24):
        np.testing.assert_allclose(np.asarray(got)[:, b - 2:b + 2],
                                   np.asarray(want)[:, b - 2:b + 2],
                                   rtol=1e-5, atol=1e-5)
    assert got.shape == want.shape


def test_halo_pass_slab_routing(mesh):
    """Each shard's extension must hold the true neighbor slabs."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 16, 1)
    halo = 2

    f = shard_map(lambda v: _halo_pass(v, "data", halo, 1), mesh=mesh,
                  in_specs=(P(None, "data", None),),
                  out_specs=P(None, "data", None), check_rep=False)
    ext = np.asarray(f(x))  # [1, 4*(4+2*2)=32, 1]
    per = 4 + 2 * halo
    # shard 1 (global rows 4..7): left halo must be rows 2,3; right 8,9
    s1 = ext[0, per:2 * per, 0]
    np.testing.assert_array_equal(s1[:halo], [2, 3])
    np.testing.assert_array_equal(s1[halo:-halo], [4, 5, 6, 7])
    np.testing.assert_array_equal(s1[-halo:], [8, 9])
    # shard 0: left edge extends with zeros (SAME-conv semantics)
    s0 = ext[0, :per, 0]
    np.testing.assert_array_equal(s0[:halo], [0, 0])
    # shard 3: right edge likewise
    s3 = ext[0, 3 * per:, 0]
    np.testing.assert_array_equal(s3[-halo:], [0, 0])


def test_crop_inverts_pad():
    x = jnp.arange(10.0).reshape(1, 10, 1)
    np.testing.assert_array_equal(np.asarray(_crop(x, 2, 1))[0, :, 0],
                                  [2, 3, 4, 5, 6, 7])
