"""Smoke tests for the remaining eval CLIs (test_synapse, test_3d) driven
exactly as a user would: a saved checkpoint in the reference snapshot layout
plus synthetic datasets (reference: test.py / test_3D.py entry points)."""

import json
import os

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arco_tpu.train import checkpoint as ckpt

NUM_CLASSES = 2


def _save_model_checkpoint(snapshot, model, input_shape):
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)},
                           jnp.zeros(input_shape), train=False)
    state = {"params": {"model": variables["params"]},
             "batch_stats": {"model": variables.get("batch_stats", {})}}
    ckpt.save_state(snapshot, 10, state)


@pytest.mark.slow
class TestSynapseEvalCLI:
    def test_end_to_end(self, tmp_path, capsys):
        from arco_tpu.cli import test_synapse
        from arco_tpu.models import net_factory

        root = tmp_path / "Synapse"
        root.mkdir()
        rng = np.random.RandomState(0)
        cases = ["case0001"]
        for c in cases:
            with h5py.File(root / f"{c}.npy.h5", "w") as f:
                f["image"] = rng.rand(3, 64, 64).astype(np.float32)
                f["label"] = rng.randint(0, NUM_CLASSES,
                                         (3, 64, 64)).astype(np.int64)
        (root / "test_vol.txt").write_text("\n".join(cases) + "\n")

        snap_root = tmp_path / "model"
        snapshot = snap_root / "Synapse/smoke_5_labeledfinal" / "unet"
        model = net_factory("unet", in_chns=1, class_num=NUM_CLASSES)
        _save_model_checkpoint(str(snapshot), model, (1, 64, 64, 1))

        result = test_synapse.main([
            "--root_path", str(root), "--exp", "Synapse/smoke",
            "--num_classes", str(NUM_CLASSES),
            "--snapshot_dir", str(snap_root),
            "--input_size", "64", "64"])
        out = capsys.readouterr().out.strip().splitlines()[-1]
        payload = json.loads(out)
        assert payload["iteration"] == 10
        assert 0.0 <= payload["mean_dice"] <= 1.0
        assert np.asarray(result["mean"]).shape == (4,)

    def test_missing_checkpoint_exits(self, tmp_path):
        from arco_tpu.cli import test_synapse
        with pytest.raises(SystemExit):
            test_synapse.main(["--root_path", str(tmp_path),
                               "--snapshot_dir", str(tmp_path)])


@pytest.mark.slow
class TestTest2DSweep:
    def test_checkpoint_sweep_reports_best(self, tmp_path, capsys):
        from arco_tpu.cli import test_2d
        from arco_tpu.data.synthetic import make_acdc_like
        from arco_tpu.models import net_factory

        root = make_acdc_like(str(tmp_path / "ACDC"), n_train=4, n_val=2,
                              size=(64, 64), num_classes=3)
        snap_root = tmp_path / "model"
        snapshot = snap_root / "ACDC/sweep_7_labeledfinal" / "unet"
        model = net_factory("unet", in_chns=1, class_num=3)
        for it in (1000, 2000):
            variables = model.init({"params": jax.random.PRNGKey(it),
                                    "dropout": jax.random.PRNGKey(0)},
                                   jnp.zeros((1, 64, 64, 1)), train=False)
            state = {"params": {"model": variables["params"]},
                     "batch_stats": {"model":
                                     variables.get("batch_stats", {})}}
            ckpt.save_state(str(snapshot), it, state)

        best = test_2d.main([
            "--root_path", root, "--exp", "ACDC/sweep",
            "--num_classes", "3", "--snapshot_dir", str(snap_root),
            "--input_size", "64", "64",
            "--startEpoch", "1000", "--endEpoch", "2000",
            "--stepEpoch", "1000"])
        out = capsys.readouterr().out.strip().splitlines()
        payloads = [json.loads(l) for l in out[-3:]]
        assert {p.get("iteration") for p in payloads[:2]} == {1000, 2000}
        assert payloads[2]["best_iteration"] in (1000, 2000)
        assert best[0] == payloads[2]["best_iteration"]


@pytest.mark.slow
class TestLA3DEvalCLI:
    def test_end_to_end_host_path(self, tmp_path):
        from arco_tpu.cli import test_3d
        from arco_tpu.models import net_factory_3d

        root = tmp_path / "LA"
        rng = np.random.RandomState(1)
        cases = ["case_a"]
        for c in cases:
            os.makedirs(root / c)
            with h5py.File(root / c / "mri_norm2.h5", "w") as f:
                f["image"] = rng.rand(48, 48, 32).astype(np.float32)
                f["label"] = (rng.rand(48, 48, 32) > 0.9).astype(np.uint8)
        (root / "test.list").write_text("\n".join(cases) + "\n")

        snap_root = tmp_path / "model"
        snapshot = snap_root / "LA/smoke_8_labeledfinal" / "vnet"
        model = net_factory_3d("vnet", in_chns=1, class_num=NUM_CLASSES)
        _save_model_checkpoint(str(snapshot), model, (1, 32, 32, 16, 1))

        result = test_3d.main([
            "--root_path", str(root), "--exp", "LA/smoke",
            "--num_classes", str(NUM_CLASSES),
            "--snapshot_dir", str(snap_root),
            "--patch_size", "32", "32", "16",
            "--stride_xy", "16", "--stride_z", "8",
            "--device_eval", "0"])
        assert result is not None
