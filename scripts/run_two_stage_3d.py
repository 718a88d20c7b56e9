"""Two-stage 3D protocol demo through the real CLIs: stage-1 ISD_3d
pretrain at the reference stage-1 budget, --resume handoff, a stage-2 ARCO
segment, then the sliding-window checkpoint sweep (reference
pretrain_3D.py -> train_arco_3d.py handoff, test_3D.py:39-41).

Runs stage 2 with the round-2 perf defaults being proven at scale:
remat=False (HBM now fits) and --arco.eqv_on_log_only (the logging-only
eqv leg on its logging cadence) — see docs/PERF.md round-2 addendum.

    PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/run_two_stage_3d.py \
        [--pre-iters 6000] [--arco-iters 1500]
"""

import argparse
import contextlib
import io
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = os.path.join(REPO, "runs", "twostage3d")
DATA = os.path.join(RUNS, "synth_la")
MODEL_DIR = os.path.join(RUNS, "model")
PRE_EXP = "LA/r2pre3d"
ARCO_EXP = "LA/r2two3d"


def ensure_data():
    if os.path.exists(os.path.join(DATA, "train.list")):
        return
    from arco_tpu.data.synthetic import make_la_like
    print("generating synthetic LA-shaped dataset ...", flush=True)
    make_la_like(DATA, n_train=16, size=(128, 128, 96), seed=0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pre-iters", type=int, default=6000)
    p.add_argument("--arco-iters", type=int, default=1500)
    p.add_argument("--skip-pretrain", action="store_true")
    p.add_argument("--sweep-only", action="store_true")
    args = p.parse_args()

    os.makedirs(RUNS, exist_ok=True)
    ensure_data()

    if not (args.skip_pretrain or args.sweep_only):
        from arco_tpu.cli import pretrain_3d
        pre_argv = [
            "--root_path", DATA, "--exp", PRE_EXP, "--labeled_num", "8",
            "--max_iterations", str(args.pre_iters),
            "--snapshot_dir", MODEL_DIR, "--log_every", "200",
        ]
        print("pretrain argv:", pre_argv, flush=True)
        pretrain_3d.main(pre_argv)

    if not args.sweep_only:
        from arco_tpu.cli import train_arco_3d
        arco_argv = [
            "--root_path", DATA, "--exp", ARCO_EXP, "--labeled_num", "8",
            "--max_iterations", str(args.arco_iters),
            "--snapshot_dir", MODEL_DIR, "--resume", PRE_EXP,
            "--full_ckpt_every", str(args.arco_iters),
            "--log_every", "50", "--ckpt_every", "500",
            "--arco.eqv_on_log_only", "true",
        ]
        print("arco argv:", arco_argv, flush=True)
        train_arco_3d.main(arco_argv)

    from arco_tpu.cli import test_3d
    sweep_argv = [
        "--root_path", DATA, "--exp", ARCO_EXP, "--labeled_num", "8",
        "--snapshot_dir", MODEL_DIR, "--startEpoch", "500",
        "--endEpoch", str(args.arco_iters), "--stepEpoch", "500",
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
        test_3d.main(sweep_argv)
    with open(os.path.join(RUNS, "sweep.jsonl"), "w") as f:
        for line in buf.getvalue().splitlines():
            if line.strip().startswith("{"):
                f.write(line.strip() + "\n")
    print(json.dumps({"done": True, "runs_dir": RUNS}), flush=True)


if __name__ == "__main__":
    main()
