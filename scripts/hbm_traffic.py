"""Measured post-fusion HBM traffic budget for the ARCO train step
(VERDICT r2 item 4: 'measure, don't bound, the roofline').

Compiles the full jitted step on the current backend, walks the OPTIMIZED
(post-fusion) HLO entry computation, and models per-instruction HBM traffic
as bytes(result) + sum(bytes(operands)) — the classic no-reuse roofline
model, far tighter than XLA's pre-fusion 'bytes accessed' which counts
every producer/consumer edge of ops that end up fused. Prints:

 - total modeled traffic per step (GB) and the implied bandwidth at the
   measured step time vs the v5e peak (819 GB/s);
 - the top-N instructions by traffic with their jax op_name metadata, so
   the biggest movers are attributable to source lines.

    PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/hbm_traffic.py [--3d] [--top 15]
"""

import argparse
import json
import re
import time

import numpy as np

from arco_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

import jax
import jax.numpy as jnp

from arco_tpu.config import ArcoConfig
from arco_tpu.models import net_factory
from arco_tpu.train.arco2d import (init_arco_state, make_arco_modules,
                                   make_arco_step)
from arco_tpu.train.schedule import make_optimizer

V5E_HBM_BW = 819e9

_DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2,
                "bf16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8,
                "f64": 8, "c64": 8, "c128": 16, "s4": 1, "u4": 1,
                "f8e4m3fn": 1, "f8e5m2": 1}

_SHAPE_RE = re.compile(r"\b(" + "|".join(_DTYPE_BYTES) + r")\[([0-9,]*)\]")


def _shape_bytes(text: str) -> int:
    """Sum the byte sizes of every shape literal in ``text`` (covers tuple
    results)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def parse_entry_traffic(hlo_text: str):
    """Per-instruction traffic model over the ENTRY computation.

    Returns (rows, total_bytes): rows are dicts with name/out/read/traffic/
    op_name, sorted by traffic descending.
    """
    entry = None
    for block in re.split(r"\n\n", hlo_text):
        if re.search(r"^ENTRY ", block, re.M):
            entry = block
            break
    assert entry is not None, "no ENTRY computation found"

    # instruction grammar: name = <shape> <opcode>(...), where <shape> is
    # either one literal or a tuple '(f32[..], s32[..], ...)'. Layout
    # annotations may themselves contain parens (TPU tiling '{1,0:T(8,128)}',
    # memory spaces 'S(1)'), so the tuple alternative allows depth-1 nesting.
    instr_re = re.compile(
        r"^\s+(%?[\w.\-]+) = (\((?:[^()]|\([^()]*\))*\)|\S+) ([\w\-]+)\(",
        re.M)
    out_bytes = {}
    lines = []
    for m in instr_re.finditer(entry):
        name, shape_part, opcode = m.group(1), m.group(2), m.group(3)
        rhs = entry[m.start():entry.find("\n", m.start())]
        out_bytes[name] = _shape_bytes(shape_part)
        lines.append((name, opcode, rhs))

    rows = []
    total = 0
    for name, opcode, rhs in lines:
        # no-traffic plumbing
        if opcode in ("parameter", "constant", "get-tuple-element", "tuple",
                      "bitcast"):
            continue
        # operands live to the right of the '=' — exclude the LHS name so an
        # instruction doesn't count its own result as a read
        operands = re.findall(r"%[\w.\-]+",
                              rhs.split("=", 1)[1].split("metadata=")[0])
        read = sum(out_bytes.get(op, 0) for op in operands)
        out = out_bytes.get(name, 0)
        mm = re.search(r'op_name="([^"]*)"', rhs)
        row = {"name": name, "opcode": opcode, "out_gb": out / 1e9,
               "read_gb": read / 1e9, "traffic_gb": (out + read) / 1e9,
               "op_name": mm.group(1) if mm else ""}
        # control flow threading large state (the memobank ring-buffer
        # lax.cond): XLA buffer-aliases operands to results, the real
        # traffic is only what the taken branch touches — report, don't sum
        if opcode in ("conditional", "while"):
            row["aliased"] = True
            rows.append(row)
            continue
        rows.append(row)
        total += out + read
    rows.sort(key=lambda r: -r["traffic_gb"])
    return rows, total


def build_step(three_d: bool, hw: int, batch: int, k: int):
    on_cpu = jax.devices()[0].platform == "cpu"
    dtype = jnp.float32 if on_cpu else jnp.bfloat16
    if three_d:
        # exact trainer-parity 3D config (scripts/bench_3d.py --trainer-parity
        # --no-remat: eqv computed for logging with a stop-grad 6th forward)
        from arco_tpu.models import net_factory_3d
        k, batch = 2, 2
        cfg = ArcoConfig(compute_eqv=True, use_eqv_loss=False,
                         use_photometric=False, use_adv_morph=False,
                         apply_aug="cutmix", remat=False, K=36)
        model = net_factory_3d("vnet", in_chns=1, class_num=k, dtype=dtype)
        shape = (batch, 112, 112, 80, 1)
        modules = make_arco_modules(model, 112, 112, batch_size=batch,
                                    feature_channels=(128, 64, 32, 16, 16),
                                    fused_dim=16, dtype=dtype)
    else:
        cfg = ArcoConfig()
        model = net_factory("unet", in_chns=1, class_num=k, dtype=dtype)
        shape = (batch, hw, hw, 1)
        modules = make_arco_modules(model, hw, hw, batch_size=batch,
                                    dtype=dtype)
    tx = make_optimizer(0.01, 30000)
    state = init_arco_state(jax.random.PRNGKey(0), modules, cfg, shape, tx)
    step_fn = make_arco_step(modules, cfg, tx, num_classes=k,
                             max_iterations=30000)
    rng = np.random.RandomState(0)
    label = rng.randint(0, k, size=shape[:-1]).astype(np.int32)
    image = (label[..., None] / max(k - 1, 1)
             + 0.1 * rng.randn(*shape)).astype(np.float32)
    batch_d = {"image_l": jnp.asarray(image), "label_l": jnp.asarray(label),
               "image_u": jnp.asarray(image)}
    return state, batch_d, step_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--3d", dest="three_d", action="store_true")
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--out", default=None, help="write JSON here")
    args = ap.parse_args()

    state, batch_d, step_fn = build_step(args.three_d, args.hw, args.batch, 4)

    # unwrap to the jitted callable to lower explicitly
    lowered = step_fn.lower(state, batch_d) if hasattr(step_fn, "lower") \
        else jax.jit(step_fn).lower(state, batch_d)
    t0 = time.time()
    compiled = lowered.compile()
    print(f"compiled in {time.time() - t0:.0f}s", flush=True)
    rows, total = parse_entry_traffic(compiled.as_text())

    # measured step time (scalar fetch = fence on tunneled backends).
    # Multi-program steps (a step with auxiliary dispatches) are timed
    # through the step callable itself; the single-program step reuses the
    # AOT-compiled executable to avoid a second compile.
    call = step_fn if hasattr(step_fn, "pool_enqueue_jit") else compiled
    state2, metrics = call(state, batch_d)
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state2, metrics = call(state2, batch_d)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / args.steps

    # traffic of any auxiliary enqueue program (reported separately)
    enqueue_rows = []
    if hasattr(step_fn, "pool_enqueue_jit"):
        from arco_tpu.ops.ring_buffer import enqueue_fixed
        pool = state2.random_pool
        keys_aval = jax.ShapeDtypeStruct(
            (batch_d["image_u"].shape[0],) + pool.shape[1:], pool.dtype)
        enq = jax.jit(enqueue_fixed, donate_argnums=(0,)).lower(
            jax.ShapeDtypeStruct(pool.shape, pool.dtype),
            jax.ShapeDtypeStruct((), jnp.int32), keys_aval).compile()
        enqueue_rows, _ = parse_entry_traffic(enq.as_text())

    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    report = {
        "backend": jax.devices()[0].platform,
        "config": "3d" if args.three_d else f"2d {args.hw}^2 bs {args.batch}",
        "step_ms": round(dt * 1e3, 2),
        "modeled_traffic_gb": round(total / 1e9, 3),
        "implied_gbps": round(total / 1e9 / dt, 1),
        "pct_of_v5e_peak_bw": round(100 * total / dt / V5E_HBM_BW, 1),
        "xla_bytes_accessed_gb": round(
            float(ca.get("bytes accessed", 0)) / 1e9, 3),
        "pool_enqueue_program": [
            {k: r[k] for k in ("opcode", "traffic_gb", "op_name")}
            for r in enqueue_rows[:3]],
        "top": rows[:args.top],
    }
    print(json.dumps({k: v for k, v in report.items() if k != "top"},
                     indent=1))
    print(f"\ntop {args.top} instructions by modeled HBM traffic"
          f" (aliased control flow excluded from the total):")
    for r in report["top"]:
        tag = " [aliased]" if r.get("aliased") else ""
        print(f"  {r['traffic_gb']*1e3:9.1f} MB  {r['opcode']:<14s}{tag} "
              f"{r['op_name'][:90]}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
