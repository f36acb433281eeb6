"""Pallas TPU kernel: fully-fused KPConv influence + neighbor reduce +
kernel-point matmul.

Computes, per query point n (reference KPConv inner loop,
models/blocks.py:284-372):

    w[n,h,k]        = influence(|rel[n,h] - kp[k]|)         (in-kernel)
    weighted[n,k,c] = sum_h w[n,h,k] * nx[n,h,c]            (VMEM scratch)
    out[n,d]        = sum_{k,c} weighted[n,k,c] * W[k,c,d]  (MXU, fused)
    nn[n]           = max(1, #{h : sum_c nx[n,h,c] > 0})

Why a kernel: the XLA path materializes the gathered [N,H,C] neighbor
features and re-reads them once per kernel point (K=15 x ~272 MB at level 0
- ~60 ms/forward traced), then writes a [N,K*C] intermediate for the weight
matmul.  Here each neighbor-feature tile is streamed from HBM exactly once;
influence, all K reductions AND the weight contraction happen on-chip, so
HBM traffic is one read of nx + one write of [N,D].

Layout choices (v5e lane/sublane rules: last dim = 128 lanes, second-to-
last = 8-sublane multiples, f32):
  nx   [H, C, N]  -> block (H, C, T): C in sublanes (C % 8 == 0), T=query
                     tile in lanes — full lane utilization at any C;
  rel  3 x [H, N] -> blocks (H, T): influence math runs on [H, T] tiles
                     and w[k][h] slices broadcast over C sublanes for free;
  W    [K, C, D]  -> resident block (K, C, Td);
  out  [N, D]     -> block (T, Td) via 15 small [C,T]^T @ [C,Td] MXU dots;
  nn   [n_tiles, T] (lane-aligned; reshaped to [N] outside).

The neighbor-count division and the gather producing nx stay outside (the
division is a trivial elementwise pass; the gather is XLA's latency-bound
row gather — see kpconv_gathered_fused for the wrapper).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile_rows(c: int) -> int:
    """Query-tile width T by channel count (VMEM: nx tile H*C*T*4 double-
    buffered + scratch K*C*T + resident W under ~12 MB)."""
    if c >= 512:
        return 32
    if c >= 256:
        return 64
    return 128


def _influence_fn(d2, kp_extent: float, influence: str):
    if influence == "linear":
        return jnp.maximum(1.0 - jnp.sqrt(jnp.maximum(d2, 0.0)) / kp_extent, 0.0)
    if influence == "gaussian":
        sigma = kp_extent * 0.3
        return jnp.exp(-d2 / (2.0 * sigma**2 + 1e-9))
    return jnp.ones_like(d2)  # constant


def _kernel(
    rx_ref, ry_ref, rz_ref, nx_ref, kp_ref, w_ref,
    out_ref, nn_ref,
    acc_ref, wgt_ref,
    *, kp_extent: float, influence: str, aggregation: str, k_count: int,
):
    """Grid (n_tiles, d_tiles), d inner.  acc_ref [K, C, T] f32 scratch holds
    the per-kernel-point weighted sums (computed once per query tile at
    j == 0, reused across output-channel tiles); wgt_ref [K8, H, T] caches
    the influence weights."""
    j = pl.program_id(1)
    h_count = rx_ref.shape[0]

    @pl.when(j == 0)
    def _compute_weighted():
        rx = rx_ref[:]  # [H, T]
        ry = ry_ref[:]
        rz = rz_ref[:]
        rel_sq = rx * rx + ry * ry + rz * rz

        # Influence weights per kernel point, full [H, T] tiles.
        for k in range(k_count):
            kx, ky, kz = kp_ref[k, 0], kp_ref[k, 1], kp_ref[k, 2]
            d2 = rel_sq - 2.0 * (rx * kx + ry * ky + rz * kz) + (
                kx * kx + ky * ky + kz * kz
            )
            wgt_ref[k] = _influence_fn(d2, kp_extent, influence)

        if aggregation == "closest":
            # Keep only each neighbor's nearest kernel point: recompute the
            # min distance and mask (blocks.py:339-345).
            d2min = None
            d2s = []
            for k in range(k_count):
                kx, ky, kz = kp_ref[k, 0], kp_ref[k, 1], kp_ref[k, 2]
                d2 = rel_sq - 2.0 * (rx * kx + ry * ky + rz * kz) + (
                    kx * kx + ky * ky + kz * kz
                )
                d2s.append(d2)
                d2min = d2 if d2min is None else jnp.minimum(d2min, d2)
            for k in range(k_count):
                wgt_ref[k] = jnp.where(d2s[k] <= d2min, wgt_ref[k], 0.0)

        # Zero the accumulators, then stream neighbors: one [C, T] FMA per
        # (h, k).  w slice [1, T] broadcasts over the C sublanes for free.
        for k in range(k_count):
            acc_ref[k] = jnp.zeros_like(acc_ref[0])

        def h_step(h, nn):
            nxh = nx_ref[h].astype(jnp.float32)  # [C, T]
            for k in range(k_count):
                acc_ref[k] += wgt_ref[k, h][None, :] * nxh
            feat_sum = jnp.sum(nxh, axis=0, keepdims=True)  # [1, T]
            return nn + (feat_sum > 0.0).astype(jnp.float32)

        nn = jax.lax.fori_loop(
            0, h_count, h_step, jnp.zeros((1, rx.shape[1]), jnp.float32)
        )
        nn_ref[:] = jnp.maximum(nn, 1.0)

    # Output tile: sum_k acc[k]^T @ W[k]  ([C,T]^T x [C,Td] on the MXU).
    out = None
    for k in range(k_count):
        part = jax.lax.dot_general(
            acc_ref[k],
            w_ref[k],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, Td]
        out = part if out is None else out + part
    out_ref[:] = out.astype(out_ref.dtype)


def kpconv_fused(
    rel: jnp.ndarray,
    nx_t: jnp.ndarray,
    kernel_points: jnp.ndarray,
    weights: jnp.ndarray,
    kp_extent: float,
    influence: str = "linear",
    aggregation: str = "sum",
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """rel [N,H,3] f32 (neighbor minus query), nx_t [H,C,N] gathered
    features (shadow rows zero), kernel_points [K,3], weights [K,C,D] ->
    (out [N,D] BEFORE neighbor-count division, nn [N] f32).
    """
    n, h, _ = rel.shape
    k_count, c, d = weights.shape
    t = _tile_rows(c)
    n_pad = -(-n // t) * t
    d_t = min(d, 128)
    d_pad = -(-d // d_t) * d_t
    if d_pad != d:
        weights = jnp.pad(weights, ((0, 0), (0, 0), (0, d_pad - d)))
    if c % 8 != 0:
        c_pad = -(-c // 8) * 8
        nx_t = jnp.pad(nx_t, ((0, 0), (0, c_pad - c), (0, 0)))
        weights = jnp.pad(weights, ((0, 0), (0, c_pad - c), (0, 0)))
        c = c_pad

    # rel -> three [H, N] component planes (T in lanes).
    rx = rel[:, :, 0].T
    ry = rel[:, :, 1].T
    rz = rel[:, :, 2].T
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n))
        rx, ry, rz = (jnp.pad(a, pad) for a in (rx, ry, rz))
        nx_t = jnp.pad(nx_t, ((0, 0), (0, 0), (0, n_pad - n)))

    kernel = functools.partial(
        _kernel,
        kp_extent=float(kp_extent),
        influence=influence,
        aggregation=aggregation,
        k_count=k_count,
    )
    n_tiles = n_pad // t
    d_tiles = d_pad // d_t
    out, nn = pl.pallas_call(
        kernel,
        grid=(n_tiles, d_tiles),
        in_specs=[
            pl.BlockSpec((h, t), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, t), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, t), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, c, t), lambda i, j: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_count, 3), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_count, c, d_t), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t, d_t), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, d_pad), out_dtype),
            jax.ShapeDtypeStruct((n_tiles, t), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((k_count, c, t), jnp.float32),
            pltpu.VMEM((k_count, h, t), jnp.float32),
        ],
        interpret=interpret,
    )(rx, ry, rz, nx_t, kernel_points.astype(jnp.float32), weights)
    return out[:n, :d], nn.reshape(-1)[:n]


def kpconv_gathered_fused(
    q_pts: jnp.ndarray,
    s_pts: jnp.ndarray,
    neighb_inds: jnp.ndarray,
    x: jnp.ndarray,
    kernel_points: jnp.ndarray,
    weights: jnp.ndarray,
    kp_extent: float,
    influence: str = "linear",
    aggregation: str = "sum",
    neighbors_rel=None,
    ones_features: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full KPConv via the fused kernel: XLA row-gather of neighbor features
    (latency-bound; kept outside), fused influence+reduce+matmul inside,
    neighbor-count normalization outside.  Semantics identical to
    ops.kpconv.kpconv (reference models/blocks.py:229-372)."""
    from pcrcg_tpu.ops.masked import PAD_COORD, pad_gather

    if neighbors_rel is None:
        neighbors = pad_gather(s_pts, neighb_inds, fill_value=PAD_COORD)
        neighbors_rel = neighbors - q_pts[:, None, :]
    if ones_features:
        nx = (neighb_inds < x.shape[0]).astype(jnp.float32)[..., None]
        nx = jnp.pad(nx, ((0, 0), (0, 0), (0, 7)))  # C=1 -> 8 sublanes
        w = jnp.pad(weights, ((0, 0), (0, 7), (0, 0)))
    else:
        nx = pad_gather(x, neighb_inds, fill_value=0.0)  # [N,H,C]
        w = weights
    nx_t = jnp.transpose(nx, (1, 2, 0))  # [H,C,N]
    out, nn = kpconv_fused(
        neighbors_rel, nx_t, kernel_points, w, kp_extent, influence,
        aggregation, interpret=interpret,
    )
    return out / nn[:, None]
