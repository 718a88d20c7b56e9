"""Round-trip tests for the AOT serving export (arco_tpu/export.py).

Exports the flagship 2D U-Net, serializes to disk, deserializes with ONLY
jax.export (the serving-host dependency surface), and checks the artifact
reproduces the in-process predictor exactly — for static and symbolic
(batch-polymorphic) exports and for every output head.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arco_tpu.export import (export_predictor, load_predictor,
                             make_predict_fn, save_predictor)
from arco_tpu.models import net_factory

SIZE = 32  # spatial size: enough to exercise all 4 U-Net down/up stages


@pytest.fixture(scope="module")
def unet_and_vars():
    model = net_factory("unet", in_chns=1, class_num=4)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, SIZE, SIZE, 1), jnp.float32)
    variables = model.init({"params": rng, "dropout": jax.random.PRNGKey(1)},
                           x, train=True)
    return model, variables["params"], variables.get("batch_stats", {})


def _input(batch, seed=0):
    return np.random.RandomState(seed).randn(batch, SIZE, SIZE, 1) \
        .astype(np.float32)


def test_static_roundtrip(tmp_path, unet_and_vars):
    model, params, stats = unet_and_vars
    x = _input(2)
    exported = export_predictor(model, params, stats, (2, SIZE, SIZE, 1))
    path = str(tmp_path / "unet.stablehlo")
    save_predictor(path, exported)

    predict = load_predictor(path)
    got = np.asarray(predict(x))

    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    want = np.asarray(make_predict_fn(model, variables)(jnp.asarray(x)))
    assert got.shape == (2, SIZE, SIZE)
    assert got.dtype == np.int32
    np.testing.assert_array_equal(got, want)


def test_dynamic_batch(tmp_path, unet_and_vars):
    model, params, stats = unet_and_vars
    exported = export_predictor(model, params, stats, (1, SIZE, SIZE, 1),
                                batch="dynamic")
    path = str(tmp_path / "unet_dyn.stablehlo")
    save_predictor(path, exported)
    predict = load_predictor(path)

    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    ref = make_predict_fn(model, variables)
    for b in (1, 3):
        x = _input(b, seed=b)
        got = np.asarray(predict(x))
        assert got.shape == (b, SIZE, SIZE)
        np.testing.assert_array_equal(got, np.asarray(ref(jnp.asarray(x))))


def test_output_modes(unet_and_vars):
    model, params, stats = unet_and_vars
    x = jnp.asarray(_input(1))
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    logits = np.asarray(make_predict_fn(model, variables, "logits")(x))
    soft = np.asarray(make_predict_fn(model, variables, "softmax")(x))
    assert logits.shape == (1, SIZE, SIZE, 4)
    np.testing.assert_allclose(soft.sum(-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        soft, jax.nn.softmax(jnp.asarray(logits), axis=-1), atol=1e-6)
    with pytest.raises(ValueError):
        make_predict_fn(model, variables, "nope")


def test_bad_batch_mode(unet_and_vars):
    model, params, stats = unet_and_vars
    with pytest.raises(ValueError):
        export_predictor(model, params, stats, (1, SIZE, SIZE, 1),
                         batch="sometimes")


def test_multiplatform_lowering(unet_and_vars):
    """platforms=('tpu','cpu') must lower both from a CPU-only process —
    the artifact serves on a TPU pod and a CPU canary alike."""
    model, params, stats = unet_and_vars
    ex = export_predictor(model, params, stats, (1, SIZE, SIZE, 1),
                          platforms=("tpu", "cpu"))
    assert ex.platforms == ("tpu", "cpu")
    x = jnp.asarray(_input(1))
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    np.testing.assert_array_equal(
        np.asarray(ex.call(x)),
        np.asarray(make_predict_fn(model, variables)(x)))


def test_dtype_in_calling_convention(tmp_path, unet_and_vars):
    """dtype=bfloat16 must produce a genuinely bf16-in artifact (ADVICE r2:
    the spec used to be hardcoded float32) and load_predictor must cast the
    caller's input to the exported dtype, not an unconditional float32."""
    model, params, stats = unet_and_vars
    ex = export_predictor(model, params, stats, (1, SIZE, SIZE, 1),
                          dtype=jnp.bfloat16)
    assert ex.in_avals[0].dtype == jnp.bfloat16
    path = str(tmp_path / "unet_bf16.stablehlo")
    save_predictor(path, ex)
    predict = load_predictor(path)
    got = np.asarray(predict(_input(1)))
    assert got.shape == (1, SIZE, SIZE)


def test_shape_mismatch_is_readable(tmp_path, unet_and_vars):
    """A mis-shaped input must fail with a readable ValueError naming both
    shapes, not an opaque deserialized-call error (ADVICE r2)."""
    model, params, stats = unet_and_vars
    ex = export_predictor(model, params, stats, (2, SIZE, SIZE, 1))
    path = str(tmp_path / "unet_chk.stablehlo")
    save_predictor(path, ex)
    predict = load_predictor(path)
    with pytest.raises(ValueError, match="does not match the exported"):
        predict(_input(3))  # wrong batch
    with pytest.raises(ValueError, match="does not match the exported"):
        predict(_input(2)[..., 0])  # wrong rank


def test_vnet3d_dynamic_roundtrip(tmp_path):
    """3D flagship (V-Net, depth-last [B,H,W,D,C]) with a symbolic batch."""
    from arco_tpu.models import net_factory_3d
    model = net_factory_3d("vnet", in_chns=1, class_num=2)
    x0 = jnp.zeros((1, SIZE, SIZE, 16, 1), jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, x0, train=True)
    ex = export_predictor(model, v["params"], v.get("batch_stats", {}),
                          (1, SIZE, SIZE, 16, 1), batch="dynamic")
    path = str(tmp_path / "vnet.stablehlo")
    save_predictor(path, ex)
    predict = load_predictor(path)
    x = np.random.RandomState(2).randn(2, SIZE, SIZE, 16, 1) \
        .astype(np.float32)
    got = np.asarray(predict(x))
    assert got.shape == (2, SIZE, SIZE, 16)
    variables = {"params": v["params"]}
    if v.get("batch_stats", {}):
        variables["batch_stats"] = v["batch_stats"]
    np.testing.assert_array_equal(
        got, np.asarray(make_predict_fn(model, variables)(jnp.asarray(x))))
