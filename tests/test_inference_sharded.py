"""Segmenter3D.predict_volume_sharded: whole-volume mesh-sharded inference
must agree with the unsharded whole-volume forward (global-edge RF band
excepted) and return the exact input shape."""

import jax
import jax.numpy as jnp
import numpy as np

from arco_tpu.inference import Segmenter3D
from arco_tpu.models import net_factory_3d
from arco_tpu.parallel import create_mesh


def _make_segmenter():
    model = net_factory_3d("vnet", in_chns=1, class_num=2)
    dummy = jnp.zeros((1, 32, 32, 32, 1))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)},
                           dummy, train=False)
    return Segmenter3D(model, variables["params"],
                       variables.get("batch_stats", {}), num_classes=2)


def test_sharded_whole_volume_matches_unsharded():
    seg = _make_segmenter()
    mesh = create_mesh((4,), ("data",), devices=jax.devices()[:4])
    rng = np.random.RandomState(0)
    vol = rng.randn(60, 32, 32).astype(np.float32)  # non-divisible depth

    pred = seg.predict_volume_sharded(vol, mesh=mesh, halo=16, lattice=16)
    assert pred.shape == vol.shape
    assert pred.dtype == np.int32

    # unsharded reference on the same padded volume
    d_pad = 64  # 4 shards * lattice 16
    x = np.pad(vol, ((0, d_pad - 60), (0, 0), (0, 0)))[None, ..., None]
    want = np.asarray(seg._probs(jnp.asarray(x))).argmax(-1)[0][:60]
    agree = (pred == want).mean()
    assert agree > 0.97, agree
    # interior (away from global depth edges) matches exactly
    np.testing.assert_array_equal(pred[24:40], want[24:40])


def test_sharded_nonlattice_inplane_shape():
    """Real volumes have non-lattice in-plane extents (LA: e.g. 141x113);
    the wrapper must pad H/W to the stride lattice and crop back."""
    seg = _make_segmenter()
    mesh = create_mesh((2,), ("data",), devices=jax.devices()[:2])
    rng = np.random.RandomState(1)
    vol = rng.randn(40, 37, 29).astype(np.float32)
    pred = seg.predict_volume_sharded(vol, mesh=mesh, halo=8, lattice=16)
    assert pred.shape == vol.shape
