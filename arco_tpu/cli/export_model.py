"""Export a trained checkpoint as a self-contained serving artifact.

    python -m arco_tpu.cli.export_model \
        --exp ACDC/arco --labeled_num 7 --iteration 30000 \
        --out unet_acdc.stablehlo --platforms tpu cpu --batch dynamic

The artifact bundles the lowered XLA program AND the weights (StableHLO
via jax.export); a serving host loads it with
``arco_tpu.export.load_predictor`` (or raw ``jax.export.deserialize``) —
no model-zoo code or checkpoint needed. The reference has no analog: its
deploy path re-imports the network class and torch-loads the .pth
(test_2D.py:117-122).
"""

from __future__ import annotations

import argparse
import os

from arco_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

from arco_tpu.export import export_predictor, save_predictor
from arco_tpu.models import net_factory, net_factory_3d
from arco_tpu.train import checkpoint as ckpt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--exp", type=str, default="ACDC/example_training")
    p.add_argument("--model", type=str, default="unet")
    p.add_argument("--dims", type=int, choices=[2, 3], default=2,
                   help="2 -> net_factory (unet zoo), 3 -> net_factory_3d "
                        "(vnet zoo, depth-last [B,H,W,D,C] inputs)")
    p.add_argument("--num_classes", type=int, default=4)
    p.add_argument("--in_chns", type=int, default=1)
    p.add_argument("--labeled_num", type=int, default=7)
    p.add_argument("--snapshot_dir", type=str, default="../model")
    p.add_argument("--iteration", type=int, default=None,
                   help="checkpoint iteration; default = latest")
    p.add_argument("--input_size", type=int, nargs="+", default=[256, 256],
                   help="spatial size (2 ints for 2D, 3 for 3D)")
    p.add_argument("--batch_size", type=int, default=8,
                   help="exported batch (ignored with --batch dynamic)")
    p.add_argument("--batch", choices=["static", "dynamic"],
                   default="static")
    p.add_argument("--output", choices=["argmax", "softmax", "logits"],
                   default="argmax")
    p.add_argument("--platforms", type=str, nargs="+", default=None,
                   help="e.g. tpu cpu; default = current backend only")
    p.add_argument("--out", type=str, required=True)
    args = p.parse_args(argv)

    snapshot = os.path.join(
        args.snapshot_dir, f"{args.exp}_{args.labeled_num}_labeledfinal",
        args.model)
    step = (args.iteration if args.iteration is not None
            else ckpt.latest_step(snapshot))
    if step is None:
        raise SystemExit(f"no checkpoints under {snapshot}")
    params, stats = ckpt.load_model_params(snapshot, step, None, None)

    factory = net_factory if args.dims == 2 else net_factory_3d
    model = factory(args.model, in_chns=args.in_chns,
                    class_num=args.num_classes)
    # 2D: H W; 3D: H W D (depth-last volume convention)
    if len(args.input_size) != args.dims:
        raise SystemExit(f"--input_size needs {args.dims} ints for "
                         f"--dims {args.dims}")
    shape = (args.batch_size, *args.input_size, args.in_chns)
    exported = export_predictor(model, params, stats, shape,
                                output=args.output, batch=args.batch,
                                platforms=args.platforms)
    save_predictor(args.out, exported)
    size_mb = os.path.getsize(args.out) / 1e6
    import jax
    platforms = exported.platforms or (jax.default_backend(),)
    print(f"exported iter_{step} -> {args.out} "
          f"({size_mb:.1f} MB, platforms={platforms}, "
          f"in={exported.in_avals}, out={exported.out_avals})")


if __name__ == "__main__":
    main()
