"""Benchmark harness: full ARCO 2D train-step throughput on the local chip.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "images/sec/chip",
     "vs_baseline": N, "backend": "tpu"|"cpu"}

The reference publishes no numbers (BASELINE.md); the north star is >=5x the
PyTorch-CPU reference step throughput at matched settings. ``vs_baseline``
compares against a torch-CPU proxy of the reference step measured in-process
(6 U-Net forwards + backward through 4, reference arch and batch) at the SAME
shape as the JAX measurement, so the ratio is meaningful on both backends.

Robustness (round-1 postmortem: the official record fell back to CPU because
the tunneled TPU backend hung): the parent process runs each backend attempt
in a bounded SUBPROCESS — a hung tunnel can't hang the bench, and falling
back never requires in-process backend juggling. TPU is attempted twice
(tunnel flaps recover on minute timescales) before the CPU fallback, and the
persistent XLA cache keeps warm-compile attempts fast.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

# generous: a cold remote compile over the tunnel took ~11 min in round 1;
# warm-cache runs finish in ~2 min
TPU_ATTEMPT_TIMEOUTS = (1500.0, 600.0)
CPU_TIMEOUT = 1500.0


def bench_arco_step(steps: int = 20, warmup: int = 2, batch: int = 4,
                    hw: int = 256, k: int = 4):
    import jax
    import jax.numpy as jnp
    from arco_tpu.config import ArcoConfig
    from arco_tpu.models import net_factory
    from arco_tpu.train.arco2d import (init_arco_state, make_arco_modules,
                                       make_arco_step)
    from arco_tpu.train.schedule import make_optimizer

    on_cpu = jax.devices()[0].platform == "cpu"
    if on_cpu:  # keep the CPU fallback tractable
        hw, batch = 64, 2

    cfg = ArcoConfig()  # full reference hyper-parameters
    dtype = jnp.float32 if on_cpu else jnp.bfloat16
    model = net_factory("unet", in_chns=1, class_num=k, dtype=dtype)
    modules = make_arco_modules(model, hw, hw, batch_size=batch, dtype=dtype)
    if cfg.K % batch:
        cfg = ArcoConfig(K=(cfg.K // batch) * batch or batch)
    tx = make_optimizer(0.01, 30000)
    state = init_arco_state(jax.random.PRNGKey(0), modules, cfg,
                            (batch, hw, hw, 1), tx)
    step_fn = make_arco_step(modules, cfg, tx, num_classes=k,
                             max_iterations=30000)

    rng = np.random.RandomState(0)
    label = rng.randint(0, k, size=(batch, hw, hw)).astype(np.int32)
    image = (label[..., None].astype(np.float32) / (k - 1)
             + 0.1 * rng.randn(batch, hw, hw, 1).astype(np.float32))
    batch_d = {"image_l": jnp.asarray(image), "label_l": jnp.asarray(label),
               "image_u": jnp.asarray(image)}

    # a scalar fetch is the only reliable fence on tunneled TPU backends
    # (block_until_ready can return before remote execution completes)
    for _ in range(warmup):
        state, metrics = step_fn(state, batch_d)
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, batch_d)
    _ = float(metrics["loss"])
    dt = time.perf_counter() - t0
    images_per_step = 2 * batch  # labeled + unlabeled streams
    return steps * images_per_step / dt, hw, batch


def bench_arco_step_3d(steps: int = 10, warmup: int = 2, batch: int = 2,
                       k: int = 2):
    """Full 3D ARCO step (V-Net, [112,112,80], trainer-parity config)."""
    import jax
    import jax.numpy as jnp
    from arco_tpu.config import ArcoConfig
    from arco_tpu.models import net_factory_3d
    from arco_tpu.train.arco2d import (init_arco_state, make_arco_modules,
                                       make_arco_step)
    from arco_tpu.train.schedule import make_optimizer

    dtype = jnp.bfloat16
    # bs 2+2 fits without remat (docs/PERF.md); bs >= 4+4 needs the
    # jax.checkpoint student forwards to fit the five V-Net applications
    # at [112,112,80] in 16 GB HBM (measured OOM at 4+4 un-remat).
    # compute_eqv=False models the 3D trainer's steady-state step: from
    # round 5 the CLI defaults to eqv_on_log_only (the log-only eqv
    # forward's BN nudge measurably hurts end Dice and costs ~43% of the
    # step — see cli/train_arco_3d.py:default_3d_config)
    cfg = ArcoConfig(compute_eqv=False, use_eqv_loss=False,
                     use_photometric=False, use_adv_morph=False,
                     apply_aug="cutmix", remat=(batch >= 4), K=36,
                     memobank_init="randn")
    model = net_factory_3d("vnet", in_chns=1, class_num=k, dtype=dtype)
    shape = (batch, 112, 112, 80, 1)
    modules = make_arco_modules(model, 112, 112, batch_size=batch,
                                feature_channels=(128, 64, 32, 16, 16),
                                fused_dim=16, dtype=dtype)
    tx = make_optimizer(0.01, 6000)
    state = init_arco_state(jax.random.PRNGKey(0), modules, cfg, shape, tx)
    step_fn = make_arco_step(modules, cfg, tx, num_classes=k,
                             max_iterations=6000)
    rng = np.random.RandomState(0)
    label = rng.randint(0, k, size=shape[:-1]).astype(np.int32)
    image = (label[..., None] / max(k - 1, 1)
             + 0.1 * rng.randn(*shape)).astype(np.float32)
    batch_d = {"image_l": jnp.asarray(image), "label_l": jnp.asarray(label),
               "image_u": jnp.asarray(image)}
    for _ in range(warmup):
        state, metrics = step_fn(state, batch_d)
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, batch_d)
    _ = float(metrics["loss"])
    dt = time.perf_counter() - t0
    return steps * 2 * batch / dt


def _peak_hbm_gb():
    import jax
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        # null (not 0.0) when the backend doesn't expose the counter —
        # e.g. subprocess children on some tunneled backends (ADVICE r4)
        if "peak_bytes_in_use" not in stats:
            return None
        return round(stats["peak_bytes_in_use"] / 2 ** 30, 2)
    except Exception:
        return None


def scale_child_main(dim: int, batch: int) -> None:
    """One batch-scaling point in its own process (clean peak-HBM stat)."""
    from arco_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    backend = jax.devices()[0].platform
    if dim == 3:
        ips = bench_arco_step_3d(steps=10, batch=batch)
        metric = f"ARCO-3D train step throughput (112x112x80, bs {batch}+{batch})"
        unit = "volumes/sec/chip"
    else:
        ips, hw, _ = bench_arco_step(steps=10, batch=batch)
        metric = f"ARCO-2D train step throughput ({hw}x{hw}, bs {batch}+{batch})"
        unit = "images/sec/chip"
    print(json.dumps({"metric": metric, "dim": dim, "batch": batch,
                      "value": round(ips, 3), "unit": unit,
                      "per_sample_ms": round(2000 * batch / ips, 2),
                      "peak_hbm_gb": _peak_hbm_gb(), "backend": backend}))


def run_scaling(out_path: str = "docs/artifacts/scaling/batch_scaling.json"):
    """Batch-scaling sweep (VERDICT r3 item 7): 2D bs 2/4/8/16, 3D bs 2/4.
    Each point runs in its own subprocess so peak HBM is per-config and an
    OOM only voids that point."""
    points = [(2, b) for b in (2, 4, 8, 16)] + [(3, b) for b in (2, 4)]
    rows = []
    for dim, batch in points:
        cmd = [sys.executable, os.path.abspath(__file__), "--scale-child",
               f"--dim={dim}", f"--batch={batch}"]
        try:
            proc = subprocess.run(cmd, timeout=1500, capture_output=True,
                                  text=True)
        except subprocess.TimeoutExpired:
            rows.append({"dim": dim, "batch": batch, "error": "timeout"})
            continue
        line = next((ln for ln in proc.stdout.splitlines()
                     if ln.strip().startswith("{")), None)
        if proc.returncode or line is None:
            rows.append({"dim": dim, "batch": batch,
                         "error": f"rc={proc.returncode}",
                         "stderr_tail": proc.stderr[-400:]})
        else:
            rows.append(json.loads(line))
        print(json.dumps(rows[-1]), flush=True)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump({"points": rows}, f, indent=1)
    return rows


def bench_torch_cpu_proxy(hw: int = 256, batch: int = 4, k: int = 4,
                          steps: int = 2):
    """Reference-step compute proxy on torch CPU: 6 U-Net forwards with
    backward through the 4 student passes (SURVEY §3.2)."""
    try:
        import torch
        import torch.nn as nn
    except ImportError:
        return None

    torch.set_num_threads(os.cpu_count() or 1)

    def conv_block(cin, cout, p):
        return nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1), nn.BatchNorm2d(cout),
            nn.LeakyReLU(), nn.Dropout(p),
            nn.Conv2d(cout, cout, 3, padding=1), nn.BatchNorm2d(cout),
            nn.LeakyReLU())

    class MiniUNet(nn.Module):
        def __init__(self):
            super().__init__()
            ft = [16, 32, 64, 128, 256]
            dp = [0.05, 0.1, 0.2, 0.3, 0.5]
            self.enc = nn.ModuleList(
                [conv_block(1 if i == 0 else ft[i - 1], ft[i], dp[i])
                 for i in range(5)])
            self.up = nn.ModuleList(
                [nn.ConvTranspose2d(ft[i], ft[i - 1], 2, 2)
                 for i in range(4, 0, -1)])
            self.dec = nn.ModuleList(
                [conv_block(ft[i - 1] * 2, ft[i - 1], 0.0)
                 for i in range(4, 0, -1)])
            self.out = nn.Conv2d(ft[0], k, 3, padding=1)
            self.pool = nn.MaxPool2d(2)

        def forward(self, x):
            feats = []
            for i, blk in enumerate(self.enc):
                if i:
                    x = self.pool(x)
                x = blk(x)
                feats.append(x)
            x = feats[-1]
            for u, d, skip in zip(self.up, self.dec, feats[-2::-1]):
                x = d(torch.cat([skip, u(x)], dim=1))
            return self.out(x)

    net = MiniUNet()
    opt = torch.optim.SGD(net.parameters(), lr=0.01, momentum=0.9,
                          nesterov=True, weight_decay=1e-4)
    x = torch.randn(batch, 1, hw, hw)
    y = torch.randint(0, k, (batch, hw, hw))

    # guard: on a 1-core host a full proxy step can take minutes; project
    # from one forward and skip if a step would exceed the budget
    t0 = time.perf_counter()
    with torch.no_grad():
        net(x)
    one_fwd = time.perf_counter() - t0
    if one_fwd * 14 * steps > 240:   # ~6 fwd + backward ~ 14 fwd-equivalents
        steps = 1
        if one_fwd * 14 > 240:
            return None

    t0 = time.perf_counter()
    for _ in range(steps):
        loss = 0.0
        for _ in range(4):  # student forwards carrying grad
            loss = loss + nn.functional.cross_entropy(net(x), y)
        with torch.no_grad():  # teacher forwards
            net(x)
            net(x)
        opt.zero_grad()
        loss.backward()
        opt.step()
    dt = time.perf_counter() - t0
    return steps * 2 * batch / dt


def child_main(backend: str, quick: bool) -> None:
    """One backend attempt; prints the final JSON line on success."""
    if backend == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        # persistent cache: warm attempts skip the ~11-min remote compile.
        # TPU only — reloading CPU AOT entries across heterogeneous hosts
        # trips machine-feature mismatches (and CPU compiles in seconds).
        from arco_tpu.utils.compile_cache import enable_persistent_cache
        enable_persistent_cache()
        import jax
        if jax.devices()[0].platform == "cpu":
            print("# child: TPU requested but backend resolved to CPU",
                  file=sys.stderr)
            sys.exit(3)

    t_start = time.perf_counter()
    ips, hw, batch = bench_arco_step(steps=5 if quick else 20)
    baseline = None
    if not quick:
        try:
            baseline = bench_torch_cpu_proxy(hw=hw, batch=batch)
        except Exception:
            baseline = None
    vs = round(ips / baseline, 3) if baseline else 0
    record = {
        "metric": f"ARCO-2D train step throughput ({hw}x{hw}, bs {batch}+{batch})",
        "value": round(ips, 3), "unit": "images/sec/chip",
        "vs_baseline": vs, "backend": backend}

    # the reference trains at bs 2+2 (train_arco_2d.py:33-35); report that
    # shape too so the record reflects the actual training configuration
    # (VERDICT r2 weak #5). Best-effort: skipped if the primary measurement
    # already ate most of the attempt budget (cold remote compiles).
    if not quick and batch != 2 and time.perf_counter() - t_start < 600:
        try:
            ips2, hw2, b2 = bench_arco_step(steps=10, batch=2, hw=hw)
            record["ref_budget_metric"] = (
                f"ARCO-2D train step throughput ({hw2}x{hw2}, bs {b2}+{b2})")
            record["ref_budget_value"] = round(ips2, 3)
        except Exception as e:  # never fail the primary line
            print(f"# bs2+2 leg skipped: {e}", file=sys.stderr)

    # 3D trainer-parity point (VERDICT r4 item 6): the fleet metric must
    # capture vol/s/chip from the driver artifact, not hand-maintained docs.
    # TPU only — the full V-Net [112,112,80] step is intractable on the CPU
    # fallback. Best-effort within the attempt budget.
    if not quick and backend == "tpu" and time.perf_counter() - t_start < 900:
        try:
            vps = bench_arco_step_3d(steps=10, batch=2)
            record["metric_3d"] = ("ARCO-3D train step throughput "
                                   "(112x112x80, bs 2+2)")
            record["value_3d"] = round(vps, 3)
            record["unit_3d"] = "volumes/sec/chip"
        except Exception as e:
            print(f"# 3D leg skipped: {e}", file=sys.stderr)
    print(json.dumps(record))


def run_child(backend: str, quick: bool, timeout_s: float):
    """Run one attempt in a subprocess; return its JSON line or None."""
    cmd = [sys.executable, os.path.abspath(__file__), "--child",
           f"--backend={backend}"]
    if quick:
        cmd.append("--quick")
    try:
        proc = subprocess.run(
            cmd, timeout=timeout_s, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        print(f"# {backend} attempt exceeded {timeout_s:.0f}s", file=sys.stderr)
        return None
    if proc.stderr:
        sys.stderr.write(proc.stderr)
    if proc.returncode != 0:
        print(f"# {backend} attempt exited rc={proc.returncode}",
              file=sys.stderr)
        return None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                json.loads(line)
                return line
            except ValueError:
                continue
    print(f"# {backend} attempt produced no JSON line", file=sys.stderr)
    return None


def main():
    quick = "--quick" in sys.argv
    if "--scale-child" in sys.argv:
        dim = next(int(a.split("=")[1]) for a in sys.argv
                   if a.startswith("--dim="))
        batch = next(int(a.split("=")[1]) for a in sys.argv
                     if a.startswith("--batch="))
        scale_child_main(dim, batch)
        return
    if "--scaling" in sys.argv:
        run_scaling()
        return
    if "--child" in sys.argv:
        backend = "cpu" if "--backend=cpu" in sys.argv else "tpu"
        child_main(backend, quick)
        return

    for timeout_s in TPU_ATTEMPT_TIMEOUTS:
        line = run_child("tpu", quick, timeout_s)
        if line:
            print(line)
            return
    print("# falling back to CPU", file=sys.stderr)
    line = run_child("cpu", quick, CPU_TIMEOUT)
    if line:
        print(line)
        return
    # last resort: emit an explicit failure record rather than nothing
    print(json.dumps({
        "metric": "ARCO-2D train step throughput (unavailable)",
        "value": 0, "unit": "images/sec/chip", "vs_baseline": 0,
        "backend": "none"}))
    sys.exit(1)


if __name__ == "__main__":
    main()
