"""Two-stage reference protocol demo through the real CLIs: stage-1 ISD
pretrain, then stage-2 ARCO initialised from the stage-1 checkpoint via
--resume (reference pretrain_2D.py -> train_arco_2d.py:223-226 handoff),
then the checkpoint-sweep eval.

The committed full-budget evidence (docs/artifacts/full2d) runs ARCO from
scratch at 30k iterations; this script proves the handoff path itself at
the reference stage-1 budget (6k pretrain iterations, pretrain_2D.py:39-40)
with a shorter stage-2 so the whole protocol demo stays ~15 min of chip.

    PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/run_two_stage_2d.py \
        [--pre-iters 6000] [--arco-iters 3000]
"""

import argparse
import contextlib
import io
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = os.path.join(REPO, "runs", "twostage2d")
DATA = os.path.join(RUNS, "synth_acdc")
MODEL_DIR = os.path.join(RUNS, "model")
PRE_EXP = "ACDC/r2pre"
ARCO_EXP = "ACDC/r2two"


def ensure_data():
    if os.path.exists(os.path.join(DATA, "train_slices.list")):
        return
    from arco_tpu.data.synthetic import make_acdc_like
    print("generating synthetic ACDC-shaped dataset ...", flush=True)
    make_acdc_like(DATA, n_train=640, n_val=4, size=(256, 256),
                   num_classes=4, depth=8, seed=0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pre-iters", type=int, default=6000)
    p.add_argument("--arco-iters", type=int, default=3000)
    p.add_argument("--skip-pretrain", action="store_true")
    p.add_argument("--sweep-only", action="store_true")
    args = p.parse_args()

    os.makedirs(RUNS, exist_ok=True)
    ensure_data()

    if not (args.skip_pretrain or args.sweep_only):
        from arco_tpu.cli import pretrain_2d
        pre_argv = [
            "--root_path", DATA, "--exp", PRE_EXP, "--labeled_num", "7",
            "--max_iterations", str(args.pre_iters),
            "--snapshot_dir", MODEL_DIR, "--log_every", "200",
        ]
        print("pretrain argv:", pre_argv, flush=True)
        pretrain_2d.main(pre_argv)

    if not args.sweep_only:
        from arco_tpu.cli import train_arco_2d
        arco_argv = [
            "--root_path", DATA, "--exp", ARCO_EXP, "--labeled_num", "7",
            "--max_iterations", str(args.arco_iters),
            "--snapshot_dir", MODEL_DIR, "--resume", PRE_EXP,
            "--full_ckpt_every", str(args.arco_iters),
            "--log_every", "100",
        ]
        print("arco argv:", arco_argv, flush=True)
        train_arco_2d.main(arco_argv)

    from arco_tpu.cli import test_2d
    sweep_argv = [
        "--root_path", DATA, "--exp", ARCO_EXP, "--labeled_num", "7",
        "--snapshot_dir", MODEL_DIR, "--startEpoch", "1000",
        "--endEpoch", str(args.arco_iters), "--stepEpoch", "1000",
    ]
    buf = io.StringIO()

    class Tee(io.TextIOBase):
        def write(self, s):
            buf.write(s)
            sys.__stdout__.write(s)
            return len(s)

        def flush(self):
            sys.__stdout__.flush()

    with contextlib.redirect_stdout(Tee()):
        test_2d.main(sweep_argv)
    with open(os.path.join(RUNS, "sweep.jsonl"), "w") as f:
        for line in buf.getvalue().splitlines():
            if line.strip().startswith("{"):
                f.write(line.strip() + "\n")
    print(json.dumps({"done": True, "runs_dir": RUNS}), flush=True)


if __name__ == "__main__":
    main()
