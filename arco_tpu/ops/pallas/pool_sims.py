"""Streaming few-vs-few similarity over a huge feature axis (Pallas TPU).

The revisiting loss (train_arco_2d.py:126-136) needs sims[b, k] = <S_b, P_k>
with B=8 queries, K=36 pool rows, and F = 496*256*256 ≈ 32.5M features.
As an XLA matmul this contraction is MXU-LATENCY-bound, not bandwidth-bound:
with M=8, N=36 the systolic array runs at <2% occupancy while K streams
through it (~46 ms measured on TPU v5e vs a ~4 ms HBM roofline for the
2.9 GB of operands).

This kernel streams both operands through VMEM in F-chunks and accumulates
the [B, K] partial products on the VPU (lane-parallel FMAs + a minor-axis
reduction per chunk), so throughput is set by the HBM DMA, not by MXU tile
latency.

Status: NOT on the production path. Keeping the pool in its native 4-D
tiled shape and contracting with dot_general (losses/consistency.py) hits
~9 ms at the reference sizes on v5e — faster than this kernel's measured
8.7 ms + pad/flatten overhead once the queries need reshaping. The kernel
remains the fallback for genuinely-2D pool layouts (measured 46 ms via XLA
there) and is parity-tested in tests/test_pool_sims.py.

Grid: (F // chunk,). Per step:
    s_blk [B, T] and p_blk [K, T] arrive in VMEM;
    acc[b, k] += sum_t s_blk[b, t] * p_blk[k, t]
computed as a broadcast multiply + lane reduction per query row b (B is
tiny, so the python loop unrolls into straight-line vector code).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pool_sims_kernel(s_ref, p_ref, out_ref, *, n_b: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    p = p_ref[:].astype(jnp.float32)                  # [K, T]
    for b in range(n_b):                              # unrolled: B is small
        s_b = s_ref[b, :].astype(jnp.float32)         # [T]
        partial = jnp.sum(p * s_b[None, :], axis=1)   # [K] lane reduction
        out_ref[b, :] += partial


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def pool_similarities(queries: jnp.ndarray, pool: jnp.ndarray,
                      chunk: int = 65536, interpret: bool = False):
    """sims[b, k] = sum_f queries[b, f] * pool[k, f], f32 accumulation.

    queries: [B, F] (B small, e.g. 8); pool: [K, F] (K small, e.g. 36);
    F huge. F must be divisible by `chunk` (pad with zeros otherwise —
    zeros contribute nothing to the dot products).
    """
    b, f = queries.shape
    k = pool.shape[0]
    if f % chunk:
        pad = chunk - f % chunk
        queries = jnp.pad(queries, ((0, 0), (0, pad)))
        pool = jnp.pad(pool, ((0, 0), (0, pad)))
        f += pad
    grid = (f // chunk,)
    return pl.pallas_call(
        functools.partial(_pool_sims_kernel, n_b=b),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, k), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k), jnp.float32),
        interpret=interpret,
    )(queries, pool)
