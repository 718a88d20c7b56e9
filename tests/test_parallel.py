"""Sharding tests on the 8-device virtual CPU mesh (SURVEY §4 strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from arco_tpu.parallel.mesh import (batch_sharding, create_mesh,
                                    replicate_sharding, shard_batch)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
    return create_mesh()


class TestMesh:
    def test_mesh_spans_devices(self, mesh):
        assert mesh.devices.size == 8
        assert mesh.axis_names == ("data",)

    def test_batch_sharded_matmul_reduces_correctly(self, mesh):
        """Batch-sharded forward + psum-style mean == single-device result."""
        x = np.random.RandomState(0).randn(16, 32).astype(np.float32)
        w = np.random.RandomState(1).randn(32, 8).astype(np.float32)

        xs = jax.device_put(jnp.array(x), batch_sharding(mesh))
        ws = jax.device_put(jnp.array(w), replicate_sharding(mesh))

        @jax.jit
        def fwd(x, w):
            return jnp.mean(jnp.tanh(x @ w))

        sharded = float(fwd(xs, ws))
        local = float(fwd(jnp.array(x), jnp.array(w)))
        np.testing.assert_allclose(sharded, local, rtol=1e-5)

    def test_shard_batch_places_tree(self, mesh):
        batch = {"a": np.zeros((8, 4), np.float32),
                 "b": np.zeros((8,), np.int32)}
        out = shard_batch(batch, mesh)
        for v in out.values():
            assert v.sharding.spec == P("data")

    def test_supervised_step_sharded_matches_replicated(self, mesh):
        """The jitted supervised train step gives identical loss whether the
        batch is sharded over 8 devices or fully replicated."""
        from arco_tpu.models import net_factory
        from arco_tpu.train.schedule import make_optimizer
        from arco_tpu.train.supervised import (init_supervised_state,
                                               make_supervised_step)

        model = net_factory("unet", in_chns=1, class_num=2)
        tx = make_optimizer(0.01, 10)
        rng = np.random.RandomState(0)
        label = rng.randint(0, 2, size=(8, 16, 16)).astype(np.int32)
        image = label[..., None].astype(np.float32)

        def run(shard):
            state = init_supervised_state(jax.random.PRNGKey(0), model, tx,
                                          (8, 16, 16, 1))
            step = make_supervised_step(model, tx, 2)
            batch = {"image": jnp.asarray(image), "label": jnp.asarray(label)}
            if shard:
                state = jax.device_put(state, replicate_sharding(mesh))
                batch = shard_batch(batch, mesh)
            _, metrics = step(state, batch)
            return float(metrics["loss"])

        np.testing.assert_allclose(run(True), run(False), rtol=1e-4)
