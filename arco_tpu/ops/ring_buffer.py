"""Fixed-capacity device ring buffers (queues and memory banks).

Replaces the reference's stateful buffers with pure functional updates:
- ISD latent/mask queues (model_2D.py:163-214): fixed batch-size enqueue with
  K % B == 0, so writes never wrap mid-batch.
- per-class contrastive memory bank (loss_helper_3d.py:13-33): grows a CPU
  list then truncates; here a pre-allocated [capacity, C] array with a
  monotone count and modular pointer.
- revisiting random pool (train_arco_2d.py:108-123,156-159).

All functions return new arrays; nothing is mutated.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RingBuffer(NamedTuple):
    data: jnp.ndarray   # [capacity, feat]
    ptr: jnp.ndarray    # scalar int32, next write slot
    count: jnp.ndarray  # scalar int32, number of valid rows (<= capacity)

    @property
    def capacity(self) -> int:
        return self.data.shape[0]


def create(capacity: int, feat: int, dtype=jnp.float32,
           init: jnp.ndarray | None = None) -> RingBuffer:
    data = jnp.zeros((capacity, feat), dtype) if init is None else init
    count = jnp.array(capacity if init is not None else 0, jnp.int32)
    return RingBuffer(data=data, ptr=jnp.array(0, jnp.int32), count=count)


def enqueue(buf: RingBuffer, keys: jnp.ndarray,
            enable=True) -> RingBuffer:
    """Write ``keys`` [B, feat] at the pointer with wraparound.

    ``enable`` may be a traced bool; when False the buffer is unchanged
    (mirrors the reference skipping enqueue when no valid keys exist).
    """
    b = keys.shape[0]
    cap = buf.capacity
    idx = (buf.ptr + jnp.arange(b, dtype=jnp.int32)) % cap
    en = jnp.asarray(enable)
    written = buf.data.at[idx].set(keys.astype(buf.data.dtype))
    new_data = jnp.where(en, written, buf.data)
    ptr = jnp.where(en, (buf.ptr + b) % cap, buf.ptr).astype(jnp.int32)
    count = jnp.where(en, jnp.minimum(buf.count + b, cap), buf.count).astype(jnp.int32)
    return RingBuffer(data=new_data, ptr=ptr, count=count)


def enqueue_fixed(data: jnp.ndarray, ptr: jnp.ndarray,
                  keys: jnp.ndarray):
    """ISD-style enqueue where capacity % batch == 0 (model_2D.py:203-214).

    Returns (new_data, new_ptr). Uses one contiguous dynamic_update_slice —
    the fastest path on TPU.
    """
    b = keys.shape[0]
    cap = data.shape[0]
    if cap % b:
        # dynamic_update_slice clamps at the boundary: a non-divisible
        # batch would silently double-write the tail rows and starve the
        # head. The reference asserts K % batch_size == 0
        # (train_arco_2d.py:113); surface the same constraint here.
        raise ValueError(
            f"ring-buffer capacity ({cap}) must be divisible by the "
            f"enqueue batch ({b}); adjust K / batch sizes")
    start = (ptr,) + (jnp.array(0, ptr.dtype),) * (data.ndim - 1)
    new_data = jax.lax.dynamic_update_slice(data, keys.astype(data.dtype), start)
    new_ptr = ((ptr + b) % cap).astype(ptr.dtype)
    return new_data, new_ptr
