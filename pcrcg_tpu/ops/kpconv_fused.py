"""Pallas TPU kernel: fully-fused KPConv influence + neighbor reduce +
kernel-point matmul, with a custom VJP for training.

Computes, per query point n (reference KPConv inner loop,
models/blocks.py:284-372):

    w[n,h,k]        = influence(|rel[n,h] - kp[k]|)         (in-kernel)
    weighted[n,k,c] = sum_h w[n,h,k] * nx[n,h,c]            (VMEM scratch)
    out[n,d]        = sum_{k,c} weighted[n,k,c] * W[k,c,d]  (MXU, fused)
    nn[n]           = max(1, #{h : sum_c nx[n,h,c] > 0})

Why a kernel: the XLA path materializes the gathered [N,H,C] neighbor
features and re-reads them once per kernel point (K=15 x ~272 MB at level 0
- ~60 ms/forward traced), then writes a [N,K*C] intermediate for the weight
matmul.  Here each neighbor-feature tile is streamed from HBM exactly once
per output-channel tile; influence, all K reductions AND the weight
contraction happen on-chip, so HBM traffic is ~one read of nx + one write
of [N,D].

Layout (v5e tiling rules: block last dim divisible by 128 or equal to the
array dim; second-to-last divisible by 8 or equal):
  queries tiled at T=128 in lanes (always 128 - the divisibility rule);
  nx   [H, C, N]  -> block (H, c_blk, T): C blocked at <=128 sublane rows;
  rel  3 x [H, N] -> blocks (H, T) (full H);
  W    [K, C, D]  -> block (K, c_blk, d_blk), d_blk <= 256;
  out  [N, D]     -> block (T, d_blk), accumulated over the c grid axis;
  nn   [N, 1]     -> block (T, 1).
Grid (n_tiles, d_tiles, c_tiles), c innermost so the out tile accumulates
over consecutive steps.  nx is re-read once per d tile (d_tiles <= 2).

The neighbor-count division and the gather producing nx stay outside (the
division is a trivial elementwise pass; the gather is XLA's latency-bound
row gather - see models/kpconv.py for the wrapper).

Backward (custom VJP, gradients w.r.t. nx and W only - rel/kernel points
are fixed geometry, reference blocks.py:226):
    dW[k,c,d]  = sum_n weighted[n,k,c] g[n,d]
    dnx[n,h,c] = sum_k w[n,h,k] (g W[k]^T)[n,c]
in ONE merged Pallas kernel (_bwd_kernel) that streams nx once, with the
dW accumulator resident in VMEM across query tiles.
neighbor_num is a comparison-based count: zero gradient, exactly like the
reference's torch autodiff.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_T = 128  # query tile width (lane count - fixed by the tiling rules)


def _influence_fn(d2, kp_extent: float, influence: str):
    if influence == "linear":
        return jnp.maximum(1.0 - jnp.sqrt(jnp.maximum(d2, 0.0)) / kp_extent, 0.0)
    if influence == "gaussian":
        sigma = kp_extent * 0.3
        return jnp.exp(-d2 / (2.0 * sigma**2 + 1e-9))
    return jnp.ones_like(d2)  # constant


def _compute_wgt(rx, ry, rz, kp_ref, wgt_ref, *, kp_extent, influence,
                 aggregation, k_count):
    """Influence weights for one query tile -> wgt_ref [K, H, T] scratch."""
    rel_sq = rx * rx + ry * ry + rz * rz
    d2s = []
    for k in range(k_count):
        kx, ky, kz = kp_ref[k, 0], kp_ref[k, 1], kp_ref[k, 2]
        d2 = rel_sq - 2.0 * (rx * kx + ry * ky + rz * kz) + (
            kx * kx + ky * ky + kz * kz
        )
        d2s.append(d2)
        wgt_ref[k] = _influence_fn(d2, kp_extent, influence)
    if aggregation == "closest":
        # Keep only each neighbor's nearest kernel point (blocks.py:339-345).
        d2min = d2s[0]
        for k in range(1, k_count):
            d2min = jnp.minimum(d2min, d2s[k])
        for k in range(k_count):
            wgt_ref[k] = jnp.where(d2s[k] <= d2min, wgt_ref[k], 0.0)


def _fwd_kernel(
    rx_ref, ry_ref, rz_ref, nx_ref, kp_ref, w_ref,
    out_ref, nn_ref,
    wgt_ref, acc_ref, hsum_ref,
    *, kp_extent: float, influence: str, aggregation: str, k_count: int,
):
    jd = pl.program_id(1)
    jc = pl.program_id(2)
    c_tiles = pl.num_programs(2)
    h_count = rx_ref.shape[0]

    @pl.when(jnp.logical_and(jd == 0, jc == 0))
    def _():
        _compute_wgt(
            rx_ref[:], ry_ref[:], rz_ref[:], kp_ref, wgt_ref,
            kp_extent=kp_extent, influence=influence,
            aggregation=aggregation, k_count=k_count,
        )
        hsum_ref[:] = jnp.zeros_like(hsum_ref)

    # Weighted per-kernel-point sums for this channel block: one [c_blk, T]
    # FMA per (h, k).  wgt slice [1, T] broadcasts over the c sublanes.
    for k in range(k_count):
        acc_ref[k] = jnp.zeros_like(acc_ref[0])

    first_d_pass = jd == 0

    def h_step(h, _):
        nxh = nx_ref[h].astype(jnp.float32)  # [c_blk, T]
        for k in range(k_count):
            acc_ref[k] += wgt_ref[k, h][None, :] * nxh

        # Per-neighbor feature sums (for the neighbor-count heuristic,
        # blocks.py:369-372) accumulate across c blocks on the first d pass.
        @pl.when(first_d_pass)
        def _():
            hsum_ref[h, :] += jnp.sum(nxh, axis=0)

        return 0

    jax.lax.fori_loop(0, h_count, h_step, 0)

    @pl.when(jnp.logical_and(jd == 0, jc == c_tiles - 1))
    def _():
        nn = jnp.sum((hsum_ref[:] > 0.0).astype(jnp.float32), axis=0)  # [T]
        nn_ref[:] = jnp.maximum(nn, 1.0)[:, None]

    # Output tile contribution: sum_k acc[k]^T @ W[k]  ([c,T]^T x [c,Td]).
    out = jax.lax.dot_general(
        acc_ref[0], w_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    for k in range(1, k_count):
        out += jax.lax.dot_general(
            acc_ref[k], w_ref[k], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(jc == 0)
    def _():
        out_ref[:] = out.astype(out_ref.dtype)

    @pl.when(jc > 0)
    def _():
        out_ref[:] += out.astype(out_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    rem = (-x.shape[axis]) % multiple
    if rem == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, rem)
    return jnp.pad(x, widths)


def _merged_fwd_kernel(
    q3_ref, nxc_ref, kp_ref, w_ref,
    out_ref, nn_ref,
    wgt_ref, acc_ref, hsum_ref,
    *, kp_extent: float, influence: str, aggregation: str, k_count: int,
):
    """Merged-gather forward: channel rows 0-2 of nxc are the gathered
    ABSOLUTE support coordinates (rows 3-7 zero pad, features from row 8).
    rel is computed in-kernel against the query coordinates q3 [3, N], so
    the separate coordinate gather + transpose disappear.  Shadow rows
    gather all-zero: their rel is (-q), whose influence is finite but
    multiplies zero features — identical contribution to the reference's
    PAD_COORD convention.  W carries 8 leading zero channel rows, so the
    coordinate rows never reach the output; the neighbor-count heuristic
    skips them explicitly."""
    jd = pl.program_id(1)
    jc = pl.program_id(2)
    c_tiles = pl.num_programs(2)
    h_count = nxc_ref.shape[0]

    @pl.when(jnp.logical_and(jd == 0, jc == 0))
    def _():
        rx = nxc_ref[:, 0, :] - q3_ref[0, :][None, :]
        ry = nxc_ref[:, 1, :] - q3_ref[1, :][None, :]
        rz = nxc_ref[:, 2, :] - q3_ref[2, :][None, :]
        _compute_wgt(
            rx, ry, rz, kp_ref, wgt_ref,
            kp_extent=kp_extent, influence=influence,
            aggregation=aggregation, k_count=k_count,
        )
        hsum_ref[:] = jnp.zeros_like(hsum_ref)

    for k in range(k_count):
        acc_ref[k] = jnp.zeros_like(acc_ref[0])

    first_d = jd == 0
    first_c = jc == 0

    def h_step(h, _):
        nxh = nxc_ref[h].astype(jnp.float32)  # [c_blk, T]
        for k in range(k_count):
            acc_ref[k] += wgt_ref[k, h][None, :] * nxh

        @pl.when(first_d)
        def _():
            s_all = jnp.sum(nxh, axis=0)
            # The first block's rows 0-7 are coordinates, not features —
            # exclude them from the neighbor-count feature sums.
            s_coord = jnp.sum(nxh[:8, :], axis=0)
            hsum_ref[h, :] += jnp.where(first_c, s_all - s_coord, s_all)

        return 0

    jax.lax.fori_loop(0, h_count, h_step, 0)

    @pl.when(jnp.logical_and(jd == 0, jc == c_tiles - 1))
    def _():
        nn = jnp.sum((hsum_ref[:] > 0.0).astype(jnp.float32), axis=0)
        nn_ref[:] = jnp.maximum(nn, 1.0)[:, None]

    out = jax.lax.dot_general(
        acc_ref[0], w_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    for k in range(1, k_count):
        out += jax.lax.dot_general(
            acc_ref[k], w_ref[k], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(jc == 0)
    def _():
        out_ref[:] = out.astype(out_ref.dtype)

    @pl.when(jc > 0)
    def _():
        out_ref[:] += out.astype(out_ref.dtype)


def kpconv_fused_merged(
    q_pts: jnp.ndarray,
    nxc_t: jnp.ndarray,
    kernel_points: jnp.ndarray,
    weights8: jnp.ndarray,
    kp_extent: float,
    influence: str = "linear",
    aggregation: str = "sum",
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """q_pts [N,3] query coords, nxc_t [Hp, 8+C, N] gathered
    [coords|pad|features] (ONE gather per block, fill 0), weights8
    [K, 8+C, D] with the first 8 channel rows zero ->
    (out [N,D] BEFORE neighbor-count division, nn [N] f32)."""
    n = q_pts.shape[0]
    k_count, c8, d = weights8.shape
    assert nxc_t.shape[1] == c8, (nxc_t.shape, weights8.shape)

    nxc_t = _pad_to(nxc_t, 0, 8)
    h_pad = nxc_t.shape[0]
    if c8 <= 128:
        nxc_t = _pad_to(nxc_t, 1, 8)
        weights8 = _pad_to(weights8, 1, 8)
    else:
        nxc_t = _pad_to(nxc_t, 1, 128)
        weights8 = _pad_to(weights8, 1, 128)
    c_pad = weights8.shape[1]
    c_blk = min(c_pad, 128)
    if d > 256:
        weights8 = _pad_to(weights8, 2, 256)
    d_pad = weights8.shape[2]
    d_blk = min(d_pad, 256)

    q3 = _pad_to(q_pts.T.astype(jnp.float32), 1, _T)  # [3, N]
    nxc_t = _pad_to(nxc_t, 2, _T)
    n_pad = q3.shape[1]

    kernel = functools.partial(
        _merged_fwd_kernel,
        kp_extent=float(kp_extent),
        influence=influence,
        aggregation=aggregation,
        k_count=k_count,
    )
    out, nn = pl.pallas_call(
        kernel,
        grid=(n_pad // _T, d_pad // d_blk, c_pad // c_blk),
        in_specs=[
            pl.BlockSpec((3, _T), lambda i, jd, jc: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((h_pad, c_blk, _T), lambda i, jd, jc: (0, jc, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_count, 3), lambda i, jd, jc: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_count, c_blk, d_blk), lambda i, jd, jc: (0, jc, jd), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_T, d_blk), lambda i, jd, jc: (i, jd), memory_space=pltpu.VMEM),
            pl.BlockSpec((_T, 1), lambda i, jd, jc: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, d_pad), out_dtype),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((k_count, h_pad, _T), jnp.float32),
            pltpu.VMEM((k_count, c_blk, _T), jnp.float32),
            pltpu.VMEM((h_pad, _T), jnp.float32),
        ],
        interpret=interpret,
    )(q3, nxc_t, kernel_points.astype(jnp.float32), weights8.astype(jnp.float32))
    return out[:n, :d], nn[:n, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def kpconv_fused_merged_ad(
    q_pts, nxc_t, kernel_points, weights8,
    kp_extent, influence="linear", aggregation="sum", interpret=False,
    needs_dnx=True,
):
    """Differentiable merged-gather fused KPConv (gradients w.r.t. nxc_t
    and weights8; query/kernel geometry is fixed)."""
    return kpconv_fused_merged(
        q_pts, nxc_t, kernel_points, weights8, kp_extent, influence,
        aggregation, interpret=interpret,
    )


def _kpconv_merged_fwd(q_pts, nxc_t, kernel_points, weights8, kp_extent,
                       influence, aggregation, interpret, needs_dnx):
    out = kpconv_fused_merged(
        q_pts, nxc_t, kernel_points, weights8, kp_extent, influence,
        aggregation, interpret=interpret,
    )
    return out, (q_pts, nxc_t, kernel_points, weights8)


def _kpconv_merged_bwd(kp_extent, influence, aggregation, interpret,
                       needs_dnx, res, cots):
    q_pts, nxc_t, kernel_points, weights8 = res
    g, _g_nn = cots
    # rel planes from the stored merged gather (cheap [H,N] slices).
    qx = q_pts[:, 0].astype(jnp.float32)
    rel_planes = (
        nxc_t[:, 0, :].astype(jnp.float32) - qx[None, :],
        nxc_t[:, 1, :].astype(jnp.float32) - q_pts[:, 1].astype(jnp.float32)[None, :],
        nxc_t[:, 2, :].astype(jnp.float32) - q_pts[:, 2].astype(jnp.float32)[None, :],
    )
    dnx_t, dw = _bwd_from_planes(
        rel_planes, nxc_t, g.astype(jnp.float32), kernel_points, weights8,
        kp_extent, influence, aggregation, interpret=interpret,
    )
    if not needs_dnx:
        dnx_t = jnp.zeros_like(nxc_t)
    return (
        jnp.zeros_like(q_pts),
        dnx_t.astype(nxc_t.dtype),
        jnp.zeros_like(kernel_points),
        dw.astype(weights8.dtype),
    )


kpconv_fused_merged_ad.defvjp(_kpconv_merged_fwd, _kpconv_merged_bwd)


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

    # Sublane-align the neighbor axis; padded rows carry zero features, so
    # they add nothing to the weighted sums or the neighbor count.
    nx_t = _pad_to(nx_t, 0, 8)
    rel = _pad_to(rel, 1, 8)
    h_pad = rel.shape[1]

    # Channel block: full C up to 128, else 128-row blocks (C padded).
    if c <= 128:
        nx_t = _pad_to(nx_t, 1, 8)
        weights = _pad_to(weights, 1, 8)
    else:
        nx_t = _pad_to(nx_t, 1, 128)
        weights = _pad_to(weights, 1, 128)
    c_pad = weights.shape[1]
    c_blk = min(c_pad, 128)

    # Output-channel block: full D up to 256, else 256-column blocks.
    if d > 256:
        weights = _pad_to(weights, 2, 256)
    d_pad = weights.shape[2]
    d_blk = min(d_pad, 256)

    # rel -> three [H, N] component planes (T in lanes).
    rx = _pad_to(rel[:, :, 0].T, 1, _T)
    ry = _pad_to(rel[:, :, 1].T, 1, _T)
    rz = _pad_to(rel[:, :, 2].T, 1, _T)
    nx_t = _pad_to(nx_t, 2, _T)
    n_pad = rx.shape[1]

    kernel = functools.partial(
        _fwd_kernel,
        kp_extent=float(kp_extent),
        influence=influence,
        aggregation=aggregation,
        k_count=k_count,
    )
    n_tiles = n_pad // _T
    d_tiles = d_pad // d_blk
    c_tiles = c_pad // c_blk
    out, nn = pl.pallas_call(
        kernel,
        grid=(n_tiles, d_tiles, c_tiles),
        in_specs=[
            pl.BlockSpec((h_pad, _T), lambda i, jd, jc: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((h_pad, _T), lambda i, jd, jc: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((h_pad, _T), lambda i, jd, jc: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((h_pad, c_blk, _T), lambda i, jd, jc: (0, jc, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_count, 3), lambda i, jd, jc: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_count, c_blk, d_blk), lambda i, jd, jc: (0, jc, jd), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_T, d_blk), lambda i, jd, jc: (i, jd), memory_space=pltpu.VMEM),
            pl.BlockSpec((_T, 1), lambda i, jd, jc: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, d_pad), out_dtype),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((k_count, h_pad, _T), jnp.float32),
            pltpu.VMEM((k_count, c_blk, _T), jnp.float32),
            pltpu.VMEM((h_pad, _T), jnp.float32),
        ],
        interpret=interpret,
    )(rx, ry, rz, nx_t, kernel_points.astype(jnp.float32), weights.astype(jnp.float32))
    return out[:n, :d], nn[:n, 0]


def _bwd_kernel(
    rx_ref, ry_ref, rz_ref, nx_ref, g_ref, kp_ref, w_ref,
    dnx_ref, dw_ref,
    wgt_ref, gw_ref, acc_ref, dwacc_ref,
    *, kp_extent: float, influence: str, aggregation: str, k_count: int,
    d_blk: int, d_tiles: int,
):
    """Merged backward: one streaming pass over the gathered features.

        weighted[k,c,t] = Σ_h w_inf[k,h,t] · nx[h,c,t]      (at jd == 0)
        dW[k,c,d]      += Σ_t weighted[k,c,t] · g[t,d]      (VMEM accumulator
                                                             across n tiles)
        gW[k,c,t]       = Σ_d W[k,c,d] · g[t,d]             (across d tiles)
        dnx[h,c,t]      = Σ_k w_inf[k,h,t] · gW[k,c,t]      (at jd == last)

    Grid (c_tiles, n_tiles, d_tiles), d innermost.  dW lives in scratch for
    the whole (i, jd) sweep of each c block and is written on the final
    step — output-block revisits stay consecutive.
    """
    i = pl.program_id(1)
    jd = pl.program_id(2)
    n_tiles = pl.num_programs(1)
    h_count = rx_ref.shape[0]

    @pl.when(jd == 0)
    def _():
        _compute_wgt(
            rx_ref[:], ry_ref[:], rz_ref[:], kp_ref, wgt_ref,
            kp_extent=kp_extent, influence=influence,
            aggregation=aggregation, k_count=k_count,
        )
        for k in range(k_count):
            gw_ref[k] = jnp.zeros_like(gw_ref[0])
            acc_ref[k] = jnp.zeros_like(acc_ref[0])

        def h_step(h, _):
            nxh = nx_ref[h].astype(jnp.float32)  # [c_blk, T]
            for k in range(k_count):
                acc_ref[k] += wgt_ref[k, h][None, :] * nxh
            return 0

        jax.lax.fori_loop(0, h_count, h_step, 0)

    @pl.when(jnp.logical_and(i == 0, jd == 0))
    def _():
        dwacc_ref[:] = jnp.zeros_like(dwacc_ref)

    g = g_ref[:].astype(jnp.float32)  # [T, d_blk]
    for k in range(k_count):
        gw_ref[k] += jax.lax.dot_general(
            w_ref[k], g, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [c_blk, T]
        # dW partial: weighted[k] [c_blk,T] @ g [T,d_blk] -> [c_blk,d_blk].
        part = jax.lax.dot_general(
            acc_ref[k], g, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwacc_ref[k, jd] += part

    @pl.when(jd == d_tiles - 1)
    def _():
        def h_step(h, _):
            out = gw_ref[0] * wgt_ref[0, h][None, :]
            for k in range(1, k_count):
                out += gw_ref[k] * wgt_ref[k, h][None, :]
            dnx_ref[h] = out.astype(dnx_ref.dtype)
            return 0

        jax.lax.fori_loop(0, h_count, h_step, 0)

        @pl.when(i == n_tiles - 1)
        def _():
            for jj in range(d_tiles):  # static unroll: lane slices aligned
                dw_ref[:, :, jj * d_blk:(jj + 1) * d_blk] = dwacc_ref[:, jj]


def kpconv_fused_bwd(
    rel: jnp.ndarray,
    nx_t: jnp.ndarray,
    g: jnp.ndarray,
    kernel_points: jnp.ndarray,
    weights: jnp.ndarray,
    kp_extent: float,
    influence: str = "linear",
    aggregation: str = "sum",
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full backward of the fused KPConv: rel [N,H,3], nx_t [H,C,N] (the
    forward's gathered features), g [N,D] -> (dnx_t [H,C,N], dW [K,C,D])."""
    rel = _pad_to(rel, 1, 8)
    planes = (rel[:, :, 0].T, rel[:, :, 1].T, rel[:, :, 2].T)
    return _bwd_from_planes(
        planes, nx_t, g, kernel_points, weights,
        kp_extent, influence, aggregation, interpret=interpret,
    )


def _bwd_from_planes(
    planes, nx_t, g, kernel_points, weights,
    kp_extent, influence="linear", aggregation="sum", interpret=False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Backward pallas call from pre-split rel planes ([H, N] x/y/z) and
    the gathered features nx_t [H, C, N].  Outputs are sliced back to the
    given (unpadded) nx_t / weights shapes."""
    rx, ry, rz = (p.astype(jnp.float32) for p in planes)
    n = rx.shape[1]
    k_count, c, d = weights.shape
    h_orig = nx_t.shape[0]
    c_orig, d_orig = c, d

    rx, ry, rz = (_pad_to(p, 0, 8) for p in (rx, ry, rz))
    nx_t = _pad_to(nx_t, 0, 8)
    h_pad = nx_t.shape[0]
    assert rx.shape[0] == h_pad, (rx.shape, h_pad)
    if c <= 128:
        weights = _pad_to(weights, 1, 8)
        nx_t = _pad_to(nx_t, 1, 8)
    else:
        weights = _pad_to(weights, 1, 128)
        nx_t = _pad_to(nx_t, 1, 128)
    c_pad = weights.shape[1]
    # Large-C levels also carry large D; a 64-row channel block keeps the
    # dW accumulator + double-buffered nx/dnx blocks inside scoped VMEM.
    c_blk = min(c_pad, 128) if c_pad <= 128 else 64
    if d > 128:
        weights = _pad_to(weights, 2, 128)
        g = _pad_to(g, 1, 128)
    d_pad = weights.shape[2]
    d_blk = min(d_pad, 128)
    if g.shape[1] != d_pad:
        g = _pad_to(g, 1, d_pad)

    rx = _pad_to(rx, 1, _T)
    ry = _pad_to(ry, 1, _T)
    rz = _pad_to(rz, 1, _T)
    n_pad = rx.shape[1]
    nx_t = _pad_to(nx_t, 2, _T)
    g = _pad_to(g, 0, _T)

    kernel = functools.partial(
        _bwd_kernel,
        kp_extent=float(kp_extent),
        influence=influence,
        aggregation=aggregation,
        k_count=k_count,
        d_blk=d_blk,
        d_tiles=d_pad // d_blk,
    )
    dnx, dw = pl.pallas_call(
        kernel,
        grid=(c_pad // c_blk, n_pad // _T, d_pad // d_blk),
        in_specs=[
            pl.BlockSpec((h_pad, _T), lambda jc, i, jd: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((h_pad, _T), lambda jc, i, jd: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((h_pad, _T), lambda jc, i, jd: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((h_pad, c_blk, _T), lambda jc, i, jd: (0, jc, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((_T, d_blk), lambda jc, i, jd: (i, jd), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_count, 3), lambda jc, i, jd: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_count, c_blk, d_blk), lambda jc, i, jd: (0, jc, jd), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((h_pad, c_blk, _T), lambda jc, i, jd: (0, jc, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_count, c_blk, d_pad), lambda jc, i, jd: (0, jc, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h_pad, c_pad, n_pad), nx_t.dtype),
            jax.ShapeDtypeStruct((k_count, c_pad, d_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((k_count, h_pad, _T), jnp.float32),
            pltpu.VMEM((k_count, c_blk, _T), jnp.float32),
            pltpu.VMEM((k_count, c_blk, _T), jnp.float32),
            pltpu.VMEM((k_count, d_pad // d_blk, c_blk, d_blk), jnp.float32),
        ],
        interpret=interpret,
    )(rx, ry, rz, nx_t, g, kernel_points.astype(jnp.float32), weights.astype(jnp.float32))
    return dnx[:h_orig, :c_orig, :n], dw[:, :c_orig, :d_orig]


def _influence_tensor(rel, kernel_points, kp_extent, influence, aggregation):
    """XLA influence weights [N, H, K] replicating the in-kernel math."""
    diff = rel[:, :, None, :] - kernel_points[None, None, :, :]
    sq = jnp.sum(diff * diff, axis=-1)
    w = _influence_fn(sq, float(kp_extent), influence)
    if aggregation == "closest":
        one_hot = jax.nn.one_hot(
            jnp.argmin(sq, axis=2), kernel_points.shape[0], dtype=w.dtype
        )
        w = w * one_hot
    return w


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def kpconv_fused_ad(
    rel, nx_t, kernel_points, weights,
    kp_extent, influence="linear", aggregation="sum", interpret=False,
    needs_dnx=True,
):
    """Differentiable fused KPConv: gradients flow to nx_t and weights only
    (rel and kernel_points are fixed geometry, reference blocks.py:226).
    ``needs_dnx=False`` skips the feature-gradient kernel — used for the
    ones-column input whose features are constants."""
    return kpconv_fused(
        rel, nx_t, kernel_points, weights, kp_extent, influence, aggregation,
        interpret=interpret,
    )


def _kpconv_fused_fwd(rel, nx_t, kernel_points, weights, kp_extent, influence,
                      aggregation, interpret, needs_dnx):
    out = kpconv_fused(
        rel, nx_t, kernel_points, weights, kp_extent, influence, aggregation,
        interpret=interpret,
    )
    return out, (rel, nx_t, kernel_points, weights)


def _kpconv_fused_bwd(kp_extent, influence, aggregation, interpret, needs_dnx,
                      res, cots):
    rel, nx_t, kernel_points, weights = res
    g, _g_nn = cots  # neighbor_num: discrete count, zero gradient
    g = g.astype(jnp.float32)
    nx = jnp.transpose(nx_t, (2, 0, 1))  # [N,H,C]

    on_tpu = jax.default_backend() == "tpu" and not interpret

    if on_tpu or interpret:
        # One streaming pass over nx computes both cotangents on-chip.
        dnx_t, dw = kpconv_fused_bwd(
            rel, nx_t, g, kernel_points, weights, kp_extent, influence,
            aggregation, interpret=interpret,
        )
        if not needs_dnx:
            dnx_t = jnp.zeros_like(nx_t)
    else:
        w_inf = _influence_tensor(rel, kernel_points, kp_extent, influence, aggregation)
        weighted = jnp.einsum("nhk,nhc->knc", w_inf, nx.astype(jnp.float32))
        dw = jnp.einsum("knc,nd->kcd", weighted, g, preferred_element_type=jnp.float32)
        if needs_dnx:
            k_count = weights.shape[0]
            gw = jnp.einsum(
                "nd,kcd->nkc", g, weights.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )  # [N,K,C]
            dnx = w_inf[:, :, 0, None] * gw[:, None, 0, :]
            for k in range(1, k_count):
                dnx += w_inf[:, :, k, None] * gw[:, None, k, :]
            dnx_t = jnp.transpose(dnx, (1, 2, 0))
        else:
            dnx_t = jnp.zeros_like(nx_t)

    return (
        jnp.zeros_like(rel),
        dnx_t.astype(nx_t.dtype),
        jnp.zeros_like(kernel_points),
        dw.astype(weights.dtype),
    )


kpconv_fused_ad.defvjp(_kpconv_fused_fwd, _kpconv_fused_bwd)


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
        w = weights
    else:
        nx = pad_gather(x, neighb_inds, fill_value=0.0)  # [N,H,C]
        w = weights
    nx_t = jnp.transpose(nx, (1, 2, 0))  # [H,C,N]
    out, nn = kpconv_fused(
        neighbors_rel, nx_t, kernel_points, w, kp_extent, influence,
        aggregation, interpret=interpret,
    )
    return out / nn[:, None]
