"""The paper-reproduction kit must stay runnable: every recipe's argv must
parse through its target CLI's own parser, and every split list a recipe
depends on must ship in dataset_split/ (the reproducibility fixtures,
SURVEY §2.5 / dataset_split/README.txt)."""

import os

import pytest

from arco_tpu import repro

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("name", sorted(repro.RECIPES))
def test_recipe_parses(name):
    for mod, argv in repro.build_commands(name, "/tmp/data", "/tmp/model"):
        repro.validate_stage(mod, argv)


@pytest.mark.parametrize("name", sorted(repro.RECIPES))
def test_recipe_split_lists_exist(name):
    rec = repro.RECIPES[name]
    split_dir = os.path.join(REPO, "dataset_split", rec.splits_dir)
    assert os.path.isdir(split_dir), split_dir
    for lst in rec.lists:
        assert os.path.isfile(os.path.join(split_dir, lst)), (name, lst)


def test_recipe_stage_order():
    """Two-stage recipes must hand off: the ARCO stage resumes the pretrain
    exp, and eval targets the ARCO exp at the trained budget."""
    for name, rec in repro.RECIPES.items():
        stages = {s.name: list(s.argv) for s in rec.stages}
        if "pretrain" not in stages:
            continue
        pre_exp = stages["pretrain"][stages["pretrain"].index("--exp") + 1]
        tr = stages["train"]
        assert tr[tr.index("--resume") + 1] == pre_exp, name
        ev = stages["eval"]
        train_exp = tr[tr.index("--exp") + 1]
        assert ev[ev.index("--exp") + 1] == train_exp, name
        end = int(ev[ev.index("--endEpoch") + 1])
        budget = int(tr[tr.index("--max_iterations") + 1])
        assert end == budget, name


def test_label_budget_consistency():
    """Recipe labeled_num values must resolve through patients_to_slices
    for the 2D medical exps (train_arco_2d.py:91-106)."""
    from arco_tpu.config import patients_to_slices
    expected = {"acdc_1": 23, "acdc_5": 68, "acdc_10": 136,
                "mmwhs_1": 38, "mmwhs_10": 382,
                "synapse_5": 111, "lits_5": 835, "lits_10": 1668}
    for name, slices in expected.items():
        rec = repro.RECIPES[name]
        tr = list(rec.stages[1].argv)
        exp = tr[tr.index("--exp") + 1]
        ln = int(tr[tr.index("--labeled_num") + 1])
        assert patients_to_slices(exp, ln) == slices, name


def test_cli_lists_and_validate(capsys):
    repro.main(["--list"])
    out = capsys.readouterr().out
    for name in repro.RECIPES:
        assert name in out
    repro.main(["acdc_5", "--root", "/data/ACDC"])
    out = capsys.readouterr().out
    assert "python -m arco_tpu.cli.train_arco_2d" in out
    assert "--resume ACDC/pretrain" in out
