"""Virtual-mesh scaling table (VERDICT r2 stretch item 9).

The multi-chip dryrun proves the sharded ARCO step compiles and runs; this
quantifies the SHARDING OVERHEAD the mesh adds, without TPU-pod access. Each
row runs the full jitted ARCO-2D train step at a FIXED GLOBAL batch over an
n-device virtual CPU mesh (``--xla_force_host_platform_device_count``) in a
fresh subprocess. On one physical core every virtual device shares the same
silicon, so total compute is constant across rows — any wall-clock delta vs
n=1 IS the partitioning + collective (psum of grads, all-gather at the bank
boundary) overhead that XLA inserts. That isolates exactly the quantity a
real pod hides inside its speedup curve.

Interpretation: on real hardware with n chips, expected step time is
roughly  t(1)/n * (1 + overhead_n)  for the data-parallel portion (grad psum
rides ICI and overlaps; the CPU emulation is a pessimistic bound because
virtual devices serialize on one core and collectives cannot overlap
compute).

    PYTHONPATH=/root/repo python scripts/scaling_table.py \
        --devices 1 2 4 8 --out docs/artifacts/scaling/scaling_table.json
"""

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def child(n: int, steps: int, hw: int, global_batch: int) -> None:
    import time

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from arco_tpu.config import ArcoConfig
    from arco_tpu.models import net_factory
    from arco_tpu.parallel.mesh import create_mesh, replicate_sharding
    from arco_tpu.train.arco2d import (init_arco_state, make_arco_modules,
                                       make_arco_step)
    from arco_tpu.train.schedule import make_optimizer

    assert len(jax.devices()) >= n, (len(jax.devices()), n)
    devices = jax.devices()[:n]
    # same mesh shapes as __graft_entry__.dryrun_multichip: 2-axis
    # (data, space) for even n >= 4, 1-axis data otherwise
    if n >= 4 and n % 2 == 0:
        mesh = create_mesh((n // 2, 2), ("data", "space"), devices=devices)
        batch_spec = P(("data", "space"))
    else:
        mesh = create_mesh(devices=devices)
        batch_spec = P("data")

    b, k = global_batch, 4
    cfg = ArcoConfig(K=b, num_queries=32, num_negatives=16,
                     memobank_size=256, memobank_size_bg=512,
                     memobank_enqueue=32, topk=2)
    model = net_factory("unet", in_chns=1, class_num=k)
    modules = make_arco_modules(model, hw, hw, batch_size=b)
    tx = make_optimizer(0.01, 1000)
    state = init_arco_state(jax.random.PRNGKey(0), modules, cfg,
                            (b, hw, hw, 1), tx)
    state = jax.device_put(state, replicate_sharding(mesh))

    rng = np.random.RandomState(0)
    label = rng.randint(0, k, size=(b, hw, hw)).astype(np.int32)
    image = (label[..., None] / (k - 1)
             + 0.1 * rng.randn(b, hw, hw, 1)).astype(np.float32)
    shard = NamedSharding(mesh, batch_spec)
    batch = {"image_l": jax.device_put(jnp.asarray(image), shard),
             "label_l": jax.device_put(jnp.asarray(label), shard),
             "image_u": jax.device_put(jnp.asarray(image), shard)}

    step_fn = make_arco_step(modules, cfg, tx, num_classes=k,
                             max_iterations=1000)
    t0 = time.time()
    for _ in range(2):
        state, metrics = step_fn(state, batch)
    _ = float(metrics["loss"])  # scalar fetch = execution fence
    compile_s = time.time() - t0

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, batch)
    loss = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / steps
    assert np.isfinite(loss)
    print(json.dumps({"n": n, "mesh": dict(mesh.shape),
                      "ms_per_step": round(dt * 1e3, 1),
                      "compile_s": round(compile_s, 1),
                      "loss": round(loss, 4)}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--global-batch", type=int, default=8)
    ap.add_argument("--out", default=None)
    ap.add_argument("--child", type=int, default=None)
    args = ap.parse_args()

    if args.child is not None:
        child(args.child, args.steps, args.hw, args.global_batch)
        return

    rows = []
    for n in args.devices:
        env = dict(os.environ)
        kept = [t for t in env.get("XLA_FLAGS", "").split()
                if "xla_force_host_platform_device_count" not in t]
        kept.append(f"--xla_force_host_platform_device_count={n}")
        env.update({"JAX_PLATFORMS": "cpu",
                    "ARCO_NO_COMPILE_CACHE": "1",
                    "XLA_FLAGS": " ".join(kept),
                    "PYTHONPATH": REPO + os.pathsep
                    + env.get("PYTHONPATH", "")})
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             f"--child={n}", f"--steps={args.steps}", f"--hw={args.hw}",
             f"--global-batch={args.global_batch}"],
            env=env, cwd=REPO, capture_output=True, text=True, timeout=3600)
        sys.stderr.write(proc.stderr[-2000:] if proc.stderr else "")
        line = [l for l in proc.stdout.splitlines()
                if l.strip().startswith("{")]
        if proc.returncode != 0 or not line:
            print(f"# n={n} failed rc={proc.returncode}", file=sys.stderr)
            continue
        rows.append(json.loads(line[-1]))
        print(line[-1], flush=True)

    if rows and rows[0]["n"] == 1:
        base = rows[0]["ms_per_step"]
        for r in rows:
            r["overhead_vs_1dev"] = round(r["ms_per_step"] / base - 1.0, 3)
    report = {"global_batch": args.global_batch, "hw": args.hw,
              "steps": args.steps, "host": "1-core CPU (virtual devices)",
              "rows": rows}
    print(json.dumps({"table": [(r["n"], r["ms_per_step"],
                                 r.get("overhead_vs_1dev")) for r in rows]}))
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
