"""Whole-volume 3D inference sharded over a device mesh.

The reference can only evaluate large volumes through a patch sliding
window (test_util.py:139-211). On a TPU mesh, arco_tpu can instead run ONE
forward over the whole volume with the depth axis sharded across chips and
conv halos exchanged over ICI (`arco_tpu/parallel/spatial.py`).

Runs on CPU with a virtual 4-device mesh (no TPU needed):

    python examples/whole_volume_sharded.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from arco_tpu.inference import Segmenter3D
from arco_tpu.models import net_factory_3d
from arco_tpu.parallel import create_mesh


def main():
    model = net_factory_3d("vnet", in_chns=1, class_num=2)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        np.zeros((1, 32, 32, 32, 1), np.float32), train=False)
    seg = Segmenter3D(model, variables["params"],
                      variables.get("batch_stats", {}), num_classes=2,
                      patch_size=(32, 32, 16), stride_xy=16, stride_z=8,
                      device_eval=False)

    mesh = create_mesh((4,), ("data",))
    print(f"mesh: {mesh.devices.ravel().tolist()}")

    # an LA-like volume: none of the extents hit the stride lattice
    vol = np.random.RandomState(0).randn(80, 141, 113).astype(np.float32)
    pred = seg.predict_volume_sharded(vol, mesh=mesh, halo=16, lattice=16)
    print(f"volume {vol.shape} -> prediction {pred.shape}, "
          f"classes {np.unique(pred).tolist()}")

    # compare against the patch sliding window the reference would run
    pred_sw = seg.predict_volume(vol)
    agree = (pred == pred_sw).mean()
    print(f"agreement with sliding-window prediction: {agree:.3f}")


if __name__ == "__main__":
    main()
