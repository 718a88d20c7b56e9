"""High-level inference API: load a trained snapshot, predict volumes.

Convenience layer over the eval protocols so a user of the reference can
serve models with three lines:

    from arco_tpu.inference import Segmenter
    seg = Segmenter.from_snapshot("../model/ACDC/arco_7_labeledfinal/unet")
    labels = seg.predict_volume(volume)          # [D, H, W] -> [D, H, W]
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from arco_tpu.models import net_factory, net_factory_3d
from arco_tpu.train import checkpoint as ckpt


class Segmenter:
    """2D slice-protocol segmenter (ACDC/MMWHS/Synapse style)."""

    def __init__(self, model, params, batch_stats,
                 input_size: Tuple[int, int] = (256, 256),
                 num_classes: int = 4, slice_batch: int = 8):
        self.model = model
        self.params = params
        self.batch_stats = batch_stats
        self.input_size = input_size
        self.num_classes = num_classes
        self.slice_batch = slice_batch

        @jax.jit
        def _predict(x):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            logits, _, _ = model.apply(
                variables, x, train=False,
                rngs={"dropout": jax.random.PRNGKey(0)})
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        self._predict = _predict

    @classmethod
    def from_snapshot(cls, snapshot_dir: str, net_type: str = "unet",
                      num_classes: int = 4, in_chns: int = 1,
                      iteration: Optional[int] = None, **kwargs):
        step = iteration or ckpt.latest_step(snapshot_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {snapshot_dir}")
        params, stats = ckpt.load_model_params(snapshot_dir, step, None,
                                               None)
        model = net_factory(net_type, in_chns=in_chns,
                            class_num=num_classes)
        return cls(model, params, stats, num_classes=num_classes, **kwargs)

    def predict_slices(self, slices: np.ndarray) -> np.ndarray:
        """[N, H, W] (network-sized) -> [N, H, W] int labels."""
        x = jnp.asarray(slices.astype(np.float32)[..., None])
        return np.asarray(self._predict(x))

    def predict_volume(self, volume: np.ndarray) -> np.ndarray:
        """[D, H, W] any size -> labels via the slice-wise zoom protocol."""
        from arco_tpu.eval.slice2d import test_single_volume_2d
        dummy = np.zeros_like(volume, dtype=np.int64)
        _, pred = test_single_volume_2d(volume, dummy, self._predict,
                                        self.num_classes, self.input_size,
                                        self.slice_batch)
        return pred


class Segmenter3D:
    """3D sliding-window segmenter (LA style)."""

    def __init__(self, model, params, batch_stats, num_classes: int = 2,
                 patch_size=(112, 112, 80), stride_xy: int = 18,
                 stride_z: int = 4, device_eval: bool = True):
        self.num_classes = num_classes
        self.patch_size = tuple(patch_size)
        self.stride_xy = stride_xy
        self.stride_z = stride_z
        self.device_eval = device_eval

        def _probs(x):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            logits, _, _ = model.apply(
                variables, x, train=False,
                rngs={"dropout": jax.random.PRNGKey(0)})
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        self._probs = jax.jit(_probs) if not device_eval else _probs

    @classmethod
    def from_snapshot(cls, snapshot_dir: str, net_type: str = "vnet",
                      num_classes: int = 2, in_chns: int = 1,
                      iteration: Optional[int] = None, **kwargs):
        step = iteration or ckpt.latest_step(snapshot_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {snapshot_dir}")
        params, stats = ckpt.load_model_params(snapshot_dir, step, None,
                                               None)
        model = net_factory_3d(net_type, in_chns=in_chns,
                               class_num=num_classes)
        return cls(model, params, stats, num_classes=num_classes, **kwargs)

    def predict_volume(self, volume: np.ndarray) -> np.ndarray:
        if self.device_eval:
            from arco_tpu.eval.sliding_window_device import \
                test_single_case_3d_device
            pred, _ = test_single_case_3d_device(
                self._probs, volume, self.stride_xy, self.stride_z,
                self.patch_size, self.num_classes)
        else:
            from arco_tpu.eval.sliding_window import test_single_case_3d
            pred, _ = test_single_case_3d(
                self._probs, volume, self.stride_xy, self.stride_z,
                self.patch_size, self.num_classes)
        return pred

    def predict_volume_sharded(self, volume: np.ndarray, mesh=None,
                               halo: int = 16, lattice: int = 16,
                               spatial_axis: int = 1) -> np.ndarray:
        """Whole-volume forward with one spatial axis sharded over the
        device mesh (parallel/spatial.py) — no sliding window at all.

        The volume is zero-padded so the sharded axis divides the mesh and
        (local + 2*halo) hits the model's stride lattice. Use when the
        volume fits HBM collectively but not per-chip; per-device compute is
        one forward instead of the window grid."""
        from arco_tpu.parallel import create_mesh
        from arco_tpu.parallel.spatial import (shard_volume,
                                               sharded_volume_forward)
        mesh = mesh or create_mesh()
        n = mesh.shape["data"]
        vol = np.asarray(volume, np.float32)
        x = vol[None, ..., None]                      # [1, D, H, W, 1]
        d = x.shape[spatial_axis]
        # pad so local = D_pad/n is a lattice multiple; then the extended
        # slab is lattice-aligned iff 2*halo is, i.e. halo % (lattice/2) == 0
        unit = n * lattice
        d_pad = -(-max(d, unit) // unit) * unit
        local = d_pad // n
        half = max(lattice // 2, 1)
        h = min(-(-halo // half) * half, local)
        pad = [(0, 0)] * x.ndim
        pad[spatial_axis] = (0, d_pad - d)
        # the UNSHARDED spatial axes must hit the lattice too (real LA
        # volumes are e.g. 141x113 in-plane; the decoder skip concats
        # misalign otherwise)
        orig = x.shape
        for ax in range(1, x.ndim - 1):
            if ax == spatial_axis:
                continue
            size = x.shape[ax]
            pad[ax] = (0, -(-size // lattice) * lattice - size)
        x = np.pad(x, pad)
        call = sharded_volume_forward(self._probs, mesh, halo=h,
                                      spatial_axis=spatial_axis,
                                      lattice=lattice)
        probs = np.asarray(call(shard_volume(x, mesh,
                                             spatial_axis=spatial_axis)))
        pred = probs.argmax(-1)[0]
        # crop every padded axis back to the input extent
        slicer = tuple(slice(0, orig[ax] if ax != spatial_axis else d)
                       for ax in range(1, x.ndim - 1))
        return pred[slicer].astype(np.int32)
