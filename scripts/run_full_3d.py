"""Full-budget 3D ARCO run through the real CLI (VERDICT r1 missing #1,
3D analog). 6000 iterations, batch 4 (2+2), V-Net at the reference patch
[112,112,80] on synthetic LA-shaped volumes, checkpoints every 1000, then
the sliding-window checkpoint-sweep eval (reference train_arco_3d.py:33-35,
test_3D.py:39-41).

    PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/run_full_3d.py \
        [--iters 6000] [--sweep-only]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = os.path.join(REPO, "runs", "full3d")
DATA = os.path.join(RUNS, "synth_la")
MODEL_DIR = os.path.join(RUNS, "model")
EXP = "LA/r2full"


def ensure_data():
    """LA-shaped synthetic volumes big enough for the [112,112,80] patch."""
    if os.path.exists(os.path.join(DATA, "train.list")):
        return
    from arco_tpu.data.synthetic import make_la_like
    print("generating synthetic LA-shaped dataset ...", flush=True)
    make_la_like(DATA, n_train=16, size=(128, 128, 96), seed=0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=6000)
    p.add_argument("--sweep-only", action="store_true")
    args = p.parse_args()

    os.makedirs(RUNS, exist_ok=True)
    ensure_data()

    if not args.sweep_only:
        from arco_tpu.cli import train_arco_3d
        train_argv = [
            "--root_path", DATA, "--exp", EXP, "--labeled_num", "8",
            "--max_iterations", str(args.iters),
            "--snapshot_dir", MODEL_DIR, "--full_ckpt_every", "3000",
            "--log_every", "50",
        ]
        print("train argv:", train_argv, flush=True)
        train_arco_3d.main(train_argv)

    from arco_tpu.cli import test_3d
    sweep_argv = [
        "--root_path", DATA, "--exp", EXP, "--labeled_num", "8",
        "--snapshot_dir", MODEL_DIR, "--startEpoch", "1000",
        "--endEpoch", str(args.iters), "--stepEpoch", "1000",
    ]
    import contextlib
    import io
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
