"""Spatial-axis sharding with halo exchange for whole-volume 3D forwards.

SURVEY §2.9: the reference handles large volumes only by patch-wise
sliding-window inference (test_util.py:139-211) — it has no way to run one
forward over a volume that exceeds a single device's memory. On TPU the
idiomatic alternative is to shard a spatial axis of the volume over the mesh
and exchange fixed-width halos between neighbors with ``jax.lax.ppermute``
so convolution receptive fields see the data they need across the shard
boundary (scaling-book "sharded convolution" recipe).

Design:
- ``_halo_pass`` runs inside ``shard_map``: each shard sends its leading
  /trailing ``halo`` slab to its spatial neighbors (two ppermutes, riding
  ICI) and concatenates what it receives. Edge shards extend with zeros so
  SAME-conv boundary behavior matches the unsharded forward exactly.
- ``sharded_volume_forward`` wraps a model apply: exchange halos, run the
  local forward on [local + 2*halo] slabs, then crop ``halo * stride_ratio``
  from the output. For a U-Net/V-Net whose output resolution equals its
  input resolution the crop is exactly ``halo``.
- The halo must cover the network's *total* receptive-field half-width; for
  ARCO's V-Net (four stride-2 stages of 5x5x5 + 3x3x3 convs) 32 voxels is
  sufficient and aligns with the 8x lattice the strided path needs.

This is a beyond-parity capability: patch-based sliding window remains the
default (eval/sliding_window.py); this module exists for the
whole-volume-at-once path on multi-chip meshes.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _halo_pass(x, axis_name: str, halo: int, spatial_axis: int):
    """Exchange ``halo``-wide slabs with mesh neighbors along axis_name.

    x: the local shard, shape [..., L_local, ...] at spatial_axis.
    Returns the shard extended to L_local + 2*halo. Global edges extend
    with ZEROS (first-layer SAME-conv parity). Exactness contract: the
    sharded forward equals the unsharded one everywhere except within the
    receptive-field half-width of the GLOBAL volume edge — stacked SAME
    convs re-pad with zeros at every layer, which no fixed pre-extension
    can reproduce. Shard-boundary crossings are exact for halo >= RF/2."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)

    def take(a, sl):
        slicer = [slice(None)] * a.ndim
        slicer[spatial_axis] = sl
        return a[tuple(slicer)]

    lo_slab = take(x, slice(0, halo))           # goes to left neighbor
    hi_slab = take(x, slice(-halo, None))       # goes to right neighbor

    # right-shift: shard i receives the trailing slab of shard i-1
    recv_from_left = jax.lax.ppermute(
        hi_slab, axis_name, [(i, (i + 1) % n) for i in range(n)])
    # left-shift: shard i receives the leading slab of shard i+1
    recv_from_right = jax.lax.ppermute(
        lo_slab, axis_name, [(i, (i - 1) % n) for i in range(n)])

    # global edges: zeros (SAME-conv semantics) instead of wrapping around
    zeros = jnp.zeros_like(lo_slab)
    left = jnp.where(idx == 0, zeros, recv_from_left)
    right = jnp.where(idx == n - 1, zeros, recv_from_right)
    return jnp.concatenate([left, x, right], axis=spatial_axis)


def _crop(x, halo: int, spatial_axis: int):
    slicer = [slice(None)] * x.ndim
    slicer[spatial_axis] = slice(halo, x.shape[spatial_axis] - halo)
    return x[tuple(slicer)]


def sharded_volume_forward(forward: Callable, mesh: Mesh, *,
                           halo: int, spatial_axis: int = 1,
                           mesh_axis: str = "data", lattice: int = 1,
                           out_ndim_same: bool = True):
    """Build f(volume) that runs ``forward`` over a volume whose
    ``spatial_axis`` is sharded across ``mesh_axis``.

    forward: local function (e.g. partial(model.apply, variables,
      train=False)) mapping [B, D_loc+2h, H, W, C] -> same-resolution output
      (logits). Must be shape-polymorphic in the sharded axis only in the
      sense that it accepts the extended slab.
    halo: receptive-field half-width to exchange. Accuracy near shard
      boundaries improves with halo; exact equality with the unsharded
      forward holds wherever the network's receptive field fits inside the
      exchanged slab.
    lattice: the model's downsampling stride product (16 for the 4-stage
      V-Net/U-Net). The extended local slab (D_local + 2*halo) must be a
      multiple of this or the decoder's skip connections misalign.
    """
    from jax.experimental.shard_map import shard_map

    def local_fn(vol):
        ext = _halo_pass(vol, mesh_axis, halo, spatial_axis)
        out = forward(ext)
        if out_ndim_same:
            return _crop(out, halo, spatial_axis)
        return out

    def call(volume):
        if halo < 1:
            # slice(-0, None) would take the WHOLE shard as the high slab;
            # a halo-free forward needs no exchange — call `forward` plain
            raise ValueError("halo must be >= 1 (for halo=0 run the "
                             "forward without sharded_volume_forward)")
        n_shards = mesh.shape[mesh_axis]
        dim = volume.shape[spatial_axis]
        if dim % n_shards:
            raise ValueError(
                f"volume axis {spatial_axis} ({dim}) must divide evenly "
                f"over mesh axis '{mesh_axis}' ({n_shards} shards)")
        local = dim // n_shards
        if halo > local:
            raise ValueError(
                f"halo ({halo}) exceeds the local shard extent ({local}); "
                f"use fewer shards or a smaller halo")
        ext = local + 2 * halo
        if ext % lattice:
            raise ValueError(
                f"extended slab {local}+2*{halo}={ext} is not a multiple of "
                f"the model's stride lattice ({lattice}); pick halo so that "
                f"(D/shards + 2*halo) % {lattice} == 0")
        spec = [None] * volume.ndim
        spec[spatial_axis] = mesh_axis
        in_spec = P(*spec)
        # output keeps the same sharded layout (channel count may differ)
        fn = shard_map(local_fn, mesh=mesh, in_specs=(in_spec,),
                       out_specs=in_spec, check_rep=False)
        return fn(volume)

    return call


def shard_volume(volume, mesh: Mesh, spatial_axis: int = 1,
                 mesh_axis: str = "data"):
    """Place a [B, D, H, W, C] volume with D sharded over the mesh."""
    spec = [None] * volume.ndim
    spec[spatial_axis] = mesh_axis
    return jax.device_put(volume, NamedSharding(mesh, P(*spec)))
