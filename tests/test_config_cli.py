"""Config tree and reference-flag CLI parity tests."""

import pytest

from arco_tpu.config import (TrainConfig, parse_args, patients_to_slices)


class TestPatientsToSlices:
    def test_reference_budgets(self):
        """train_arco_2d.py:91-106 label-budget map."""
        assert patients_to_slices("ACDC/arco", 7) == 136
        assert patients_to_slices("ACDC/arco", 3) == 68
        assert patients_to_slices("MMWHS/x", 5) == 191
        assert patients_to_slices("Synapse", 10) == 221
        assert patients_to_slices("LiTS/run", 5) == 835
        assert patients_to_slices("JHU", 1) == 57

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            patients_to_slices("nope", 1)


class TestCLI:
    def test_reference_flat_flags(self):
        cfg = parse_args(["--base_lr", "0.02", "--labeled_num", "3",
                          "--num_queries", "128", "--func", "asmc",
                          "--apply_aug", "classmix", "--tps_sigma", "0.05",
                          "--max_iterations", "100"])
        assert cfg.optim.base_lr == 0.02
        assert cfg.data.labeled_num == 3
        assert cfg.arco.num_queries == 128
        assert cfg.arco.func == "asmc"
        assert cfg.arco.apply_aug == "classmix"
        assert cfg.arco.tps_sigma == 0.05
        assert cfg.optim.max_iterations == 100

    def test_dotted_overrides(self):
        cfg = parse_args(["--arco.k1", "0.5", "--isd.K", "48",
                          "--data.patch_size", "128", "128"])
        assert cfg.arco.k1 == 0.5
        assert cfg.isd.K == 48
        assert cfg.data.patch_size == (128, 128)

    def test_defaults_match_reference(self):
        """train_arco_2d.py:26-89 defaults."""
        cfg = parse_args([])
        assert cfg.optim.base_lr == 0.01
        assert cfg.optim.max_iterations == 30000
        assert cfg.data.batch_size == 4
        assert cfg.data.labeled_bs == 2
        assert cfg.arco.strong_threshold == 0.97
        assert cfg.arco.weak_threshold == 0.7
        assert cfg.arco.temp == 0.5
        assert cfg.arco.num_negatives == 512
        assert cfg.arco.num_queries == 256
        assert cfg.arco.K == 36
        assert cfg.arco.k1 == 0.01
        assert cfg.arco.topk == 5
        assert cfg.isd.output_pooling_size == 8
        assert cfg.isd.latent_feature_size == 512
        assert cfg.seed == 1337
