"""Standing method-quality regression (VERDICT r2 item 2).

``scripts/validate_semi_synthetic.py --task shifted`` trains two arms from a
shared supervised warmup on a task where supervised-only at the 2-image label
budget demonstrably underperforms (appearance shift the labeled set cannot
teach): arm (a) continues supervised-only, arm (b) runs the full ARCO recipe
(pseudo-label cutmix consistency, contrastive memobank, revisiting, TPS-eqv)
at the same step budget. The committed artifact records held-out Dice for
both arms across seeds on the real chip.

These tests pin the artifact: if a future change silently broke the unsup /
contrastive / eqv / revisiting path and someone re-ran the gate, the ARCO arm
would collapse to (or below) the supervised arm and the thresholds here state
exactly what "working" means. They also pin that the TASK is falsifiable —
supervised-only must land well below ceiling, otherwise a zero gap would be
indistinguishable from saturation (the round-2 failure mode: Dice >= 0.986
from iteration 1000 on the blobs task).

Reference contract: BASELINE.md §3 quality gate; the reference's published
mechanism is ACDC 5% Dice 0.892 vs supervised-only 0.796 (BASELINE.md table),
i.e. the method must measurably beat its own supervised baseline at matched
budget — this synthetic gate is the environmentally-unblocked analog.
"""

import json
import os

import pytest

ARTIFACT = os.path.join(os.path.dirname(__file__), "..", "docs", "artifacts",
                        "quality_gate", "quality_gate.json")

# Thresholds calibrated from the committed on-chip run (see the artifact and
# docs/artifacts/quality_gate/README.md). The gate fails if:
#   - the task saturates (supervised-only near ceiling -> gate can't falsify)
#   - the ARCO arm stops beating supervised-only by a material margin
SUP_CEILING = 0.93        # supervised-only must stay below this
MIN_MEAN_GAIN = 0.03      # mean (arco - supervised) Dice across seeds
MIN_SEED_GAIN = -0.01     # no seed may show a material regression


@pytest.fixture(scope="module")
def artifact():
    if not os.path.exists(ARTIFACT):
        pytest.skip("quality-gate artifact not present (run "
                    "scripts/validate_semi_synthetic.py --task shifted)")
    with open(ARTIFACT) as f:
        return json.load(f)


def test_artifact_is_the_gate_task(artifact):
    assert artifact["task"] == "shifted"
    assert len(artifact["runs"]) >= 2, "need >=2 seeds for a stable gate"
    for r in artifact["runs"]:
        assert {"supervised_dice", "arco_dice", "gain"} <= set(r)


def test_task_is_falsifiable(artifact):
    """Supervised-only must land below ceiling — otherwise a broken ARCO
    term could hide behind saturation (the round-2 blobs failure mode)."""
    sup = artifact["summary"]["mean_supervised"]
    assert sup < SUP_CEILING, (
        f"supervised-only mean Dice {sup} >= {SUP_CEILING}: task saturates, "
        "gate cannot detect a broken method term")


def test_arco_beats_supervised(artifact):
    s = artifact["summary"]
    assert s["mean_gain"] >= MIN_MEAN_GAIN, (
        f"ARCO gain {s['mean_gain']} < {MIN_MEAN_GAIN}: the semi-supervised "
        "machinery is not adding value over supervised-only — check the "
        "unsup/contrastive/eqv/revisit paths")
    assert s["min_gain"] >= MIN_SEED_GAIN, (
        f"worst-seed gain {s['min_gain']} < {MIN_SEED_GAIN}")


def test_gains_consistent_with_runs(artifact):
    for r in artifact["runs"]:
        # the artifact rounds `gain` to 4 decimals
        assert abs(r["gain"] - (r["arco_dice"] - r["supervised_dice"])) < 1e-4
