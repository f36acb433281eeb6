"""Pallas TPU kernel: fused KPConv influence + neighbor reduction.

Computes, in ONE pass over the gathered neighbor features,
    weighted[n,k,:] = Σ_h influence(|rel[n,h] − kp[k]|) · nx[n,h,:]
    neighbor_num[n] = max(1, #{h : Σ_c nx[n,h,c] > 0})
(the reference KPConv's inner loop, models/blocks.py:284-372).

Why a kernel: XLA materializes sq_distances [N,H,K] to HBM and the
K-unrolled multiply-reduce re-reads the [N,H,C] gathered features once per
kernel point (15×272 MB at level 0 — ~60 ms/call traced).  Here each query
tile is loaded into VMEM once; distances, influence and all K reductions
happen on-chip, so HBM traffic drops to a single read of nx + a small
write.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile_rows(c: int) -> int:
    # VMEM budget: nx tile [T,H,C] f32 (+double buffering + Mosaic vector
    # stack) well under the 16 MB scoped limit.  Sub-lane-width channel
    # counts pad every block to 128 lanes, so their tiles must shrink too
    # (measured: T=128 at C=1 lands 188 KB over the 16 MB scoped limit).
    if c >= 512:
        return 32
    if c >= 256 or c < 8:
        return 64
    return 128


def _kernel_2d(rel_ref, nx_ref, kp_ref, out_ref, nn_ref, *, kp_extent, influence):
    """Grid (n_tiles, K): one kernel point per instance.  The rel/nx blocks'
    index maps ignore k, so Pallas keeps them VMEM-resident across the K
    inner iterations — nx streams from HBM once per tile."""
    k = pl.program_id(1)
    rel = rel_ref[:]  # [T,H,3]
    kp_k = kp_ref[k, :]  # [3]
    rel_sq = jnp.sum(rel * rel, axis=-1)  # [T,H]
    dot = jnp.sum(rel * kp_k[None, None, :], axis=-1)
    sq_k = rel_sq - 2.0 * dot + jnp.sum(kp_k * kp_k)
    if influence == "linear":
        w_k = jnp.maximum(1.0 - jnp.sqrt(jnp.maximum(sq_k, 0.0)) / kp_extent, 0.0)
    elif influence == "gaussian":
        sigma = kp_extent * 0.3
        w_k = jnp.exp(-sq_k / (2.0 * sigma**2 + 1e-9))
    else:  # constant
        w_k = jnp.ones_like(sq_k)

    h_count = rel.shape[1]
    acc = w_k[:, 0][:, None] * nx_ref[:, 0, :].astype(jnp.float32)
    for h in range(1, h_count):
        acc = acc + w_k[:, h][:, None] * nx_ref[:, h, :].astype(jnp.float32)
    out_ref[0, :, :] = acc.astype(out_ref.dtype)

    @pl.when(k == 0)
    def _():
        c = jnp.zeros_like(rel_sq[:, :1])
        for h in range(h_count):
            s = jnp.sum(nx_ref[:, h, :].astype(jnp.float32), axis=-1, keepdims=True)
            c = c + (s > 0.0).astype(jnp.float32)
        nn_ref[:] = jnp.maximum(c, 1.0)


def kpconv_weighted_reduce(
    rel: jnp.ndarray,
    nx: jnp.ndarray,
    kernel_points: jnp.ndarray,
    kp_extent: float,
    influence: str = "linear",
    out_dtype=jnp.float32,
    interpret: bool = False,
):
    """rel [N,H,3] f32, nx [N,H,C], kernel_points [K,3] ->
    (weighted [K,N,C] out_dtype — K leading for legal block tiling —
    neighbor_num [N] f32)."""
    n, h, _ = rel.shape
    c = nx.shape[-1]
    k_count = kernel_points.shape[0]
    t = _tile_rows(c)
    n_pad = -(-n // t) * t
    if n_pad != n:
        rel = jnp.pad(rel, ((0, n_pad - n), (0, 0), (0, 0)))
        nx = jnp.pad(nx, ((0, n_pad - n), (0, 0), (0, 0)))

    kernel = functools.partial(
        _kernel_2d, kp_extent=float(kp_extent), influence=influence
    )
    weighted, nn = pl.pallas_call(
        kernel,
        grid=(n_pad // t, k_count),
        in_specs=[
            pl.BlockSpec((t, h, 3), lambda i, k: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, h, c), lambda i, k: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_count, 3), lambda i, k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # [K,N,C] layout: a (T,1,C) block would violate the (8,128)
            # last-two-dims tiling rule; (1,T,C) is legal.
            pl.BlockSpec((1, t, c), lambda i, k: (k, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 1), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k_count, n_pad, c), out_dtype),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(rel.astype(jnp.float32), nx, kernel_points.astype(jnp.float32))
    return weighted[:, :n, :], nn[:n, 0]
