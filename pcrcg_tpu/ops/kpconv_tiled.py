"""Pallas TPU kernel: candidate-DMA KPConv — no HBM row gathers at all.

The row gathers feeding KPConv are latency-bound (~6 ns/row regardless of
width — PERF.md): at level 0 a single [2.1M, 64] neighbor-feature gather
costs ~12.5 ms and the forward runs several of them.  But the tile-pruned
search (ops/tiled_search.py) already proves that each 128-query group's
neighbors live inside ``m_tiles`` Z-order support tiles of 128 points.
This kernel exploits that:

  per query group g (grid axis):
    1. DMA the group's m_tiles candidate tiles from HBM into VMEM —
       contiguous 2-D block copies, bandwidth-bound (~160 MB per level-0
       conv, ~0.1 ms at HBM speed, vs ~25 ms of row gathers);
    2. materialize the gathered neighbor rows IN VMEM with one-hot MXU
       matmuls: E[h][cand, q] = (lidx[q, h] == cand); nx_h = cand @ E.
       E is exact 0/1, so the matmul IS the gather — each output column
       has exactly one contributing candidate;
    3. run the standard fused KPConv math (influence + K reductions +
       weight contraction, ops/kpconv_fused.py) on the VMEM-resident rows.

Precision: candidate COORDS stay f32 (geometry decides influences);
candidate FEATURES go through the one-hot matmul as a bf16 hi/lo split
(hi = bf16(x), lo = bf16(x - hi)), recombined in f32 — exact to ~2^-16
relative, so results match the f32 XLA path to normal test tolerances
while the matmuls run at bf16 MXU rate.

Inputs come straight from ``radius_search_tiled(..., return_local=True)``:
``lidx`` [Nq, H] candidate-local neighbor positions (shadow = M·tile) and
``tiles`` [G, M] candidate tile ids per 128-query group.  Shadow columns
select nothing (all-zero E column): zero features, rel = -q — exactly the
reference's zero-shadow convention (models/blocks.py:269,348).

Backward: the forward's VJP recomputes nothing — it reuses the merged
backward kernel (_bwd_from_planes) on rel planes + nx saved by a
residual-emitting forward variant, then scatter-adds dnx onto the support
rows with the GLOBAL neighbor indices (segment_sum — the same op the XLA
path's gather VJP produces).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pcrcg_tpu.ops.kpconv_fused import _compute_wgt, _pad_to, _bwd_from_planes

_T = 128  # queries per group (fixed by the tiled search's group size)

# Widest input-channel count still run as ONE channel block.  Every
# per-c-block visit repays the full one-hot E build (~16M VPU ops per
# group — the kernel's dominant cost, PERF.md round-3 trace model), so
# blocking C=129 (the images-path first conv) into 2×128 blocks padded
# to 256 nearly doubled its kernel time (17.7 ms traced vs ~2 ms for the
# geometry C=1 twin).  A single 136-row block fits VMEM comfortably
# (~10 MB with double buffering at the 160 cap).
_C_SINGLE_MAX = 160


def _build_kernel(
    # scalar-prefetch
    tiles_ref,  # [G, M] int32 (SMEM)
    # inputs
    q3_ref,  # [4, T] f32 — query x/y/z rows (+pad row)
    lidx_ref,  # [1, H, T] int32 — candidate-local ids (shadow = M*tile)
    supa_ref,  # [n_tiles, c_tiles, rows_pad, tile] bf16 in ANY
    kp_ref,  # [K, 3] f32
    w_ref,  # [K, c_blk, d_blk] f32
    # outputs
    out_ref,  # [T, d_blk]
    nn_ref,  # [T, 1]
    nx_out_ref,  # [H, c_blk, T] f32 (residuals; dummy [1,1,1] when unused)
    rx_out_ref,  # [H, T] (residuals)
    ry_out_ref,
    rz_out_ref,
    # scratch
    canda_ref,  # [rows_pad, CAND] bf16
    nx_ref,  # [H, c_blk, T] f32
    rxyz_ref,  # [3, H, T] f32
    wgt_ref,  # [K, H, T] f32
    acc_ref,  # [K, c_blk, T] f32
    hsum_ref,  # [H, T] f32 — per-neighbor channel sums across c blocks
    outacc_ref,  # [d_tiles, T, d_blk] f32 — out acc across jc ([1,1,1] if c_tiles==1)
    sem,  # DMA semaphore
    *,
    kp_extent: float,
    influence: str,
    aggregation: str,
    k_count: int,
    m_tiles: int,
    tile: int,
    h_count: int,
    save_residuals: bool,
    c_tiles: int,
    d_tiles: int,
    feat_limbs: int,
):
    """Grid (g, jc, jd), OUTPUT block innermost: each step covers one
    (query group, channel block, output block).  The expensive per-channel-
    block work — candidate DMA, one-hot E build/unpack, influence reduce —
    depends only on (g, jc), so it runs under ``jd == 0`` and its results
    persist in scratch across the jd steps (the per-visit E build is the
    kernel's dominant VPU cost; with jc innermost it was repaid d_tiles
    times).  The influence weights depend only on g and are computed once
    at (jc==0, jd==0).  Because out blocks (index map (g, jd)) are now
    revisited NON-consecutively across jc, cross-jc accumulation happens in
    the ``outacc`` scratch and out is written on each block's final visit
    (Pallas only keeps output blocks resident across consecutive
    revisits)."""
    g = pl.program_id(0)
    jc = pl.program_id(1)
    jd = pl.program_id(2)
    cand = m_tiles * tile
    c_blk = nx_ref.shape[1]
    c4 = 8 + c_blk

    first_d = jd == 0
    last_d = jd == d_tiles - 1

    @pl.when(first_d)
    def _unpack():
        # 1. DMA the candidate tiles for this channel block.  supa is
        # stored TILE-MAJOR ([n_tiles, c_tiles, rows, tile]) so each tile
        # is ONE contiguous HBM burst — slicing a row-major [rows, Ns]
        # array at 128 lanes would shatter every copy into `rows` 256-byte
        # segments and strangle the DMA engine.
        copies = []
        for m in range(m_tiles):
            t_id = tiles_ref[g, m]
            cp = pltpu.make_async_copy(
                supa_ref.at[t_id, jc],
                canda_ref.at[:, pl.ds(m * tile, tile)],
                sem,
            )
            cp.start()
            copies.append(cp)
        for cp in copies:
            cp.wait()

        # 2. Materialize neighbor rows via one-hot matmuls (the E matmul IS
        # the gather: exactly one 1 per column).  Coords AND features ride
        # the same bf16 hi/lo array: one dot per h, exact to ~2^-24 after
        # recombination.
        canda = canda_ref[:]  # [rows_pad, CAND] bf16 (junk pad rows at bottom)

        # hsum accumulates per-neighbor feature sums across the jc steps
        # (from the f32 header row 4 gathered below) — zero it first.
        @pl.when(jc == 0)
        def _():
            hsum_ref[:] = jnp.zeros_like(hsum_ref)
        # Process HB h-steps per matmul: one [rows, CAND] @ [CAND, HB*T] dot
        # amortizes instruction overhead ~HB-fold vs per-h dots.
        hb = 8
        for h0 in range(0, h_count, hb):
            hb_cur = min(hb, h_count - h0)
            lblk = lidx_ref[0, h0 : h0 + hb_cur].reshape(hb_cur * _T)  # [HB*T]
            # column j of E selects candidate lidx[h0 + j//T, j%T]
            row_iota = jax.lax.broadcasted_iota(jnp.int32, (cand, hb_cur * _T), 0)
            ef = (row_iota == lblk[None, :]).astype(jnp.bfloat16)
            nxa = jax.lax.dot_general(
                canda, ef, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [rows_pad, HB*T]
            if feat_limbs == 2:
                # Layout [hi(8+c) | lo(8+c) | limb3 header(8)]: features
                # recombine hi+lo (~2^-16 relative), coords add the third
                # limb.
                full = nxa[:c4] + nxa[c4 : 2 * c4]
                limb3 = nxa[2 * c4 : 2 * c4 + 8]
                hdr = full[:8]
                feats_rows = full[8:]
            else:
                # Layout [hi(8+c) | lo header(8) | limb3 header(8)]:
                # features ride a SINGLE bf16 limb (~2^-9 relative — the
                # same grade as the Mosaic one-bf16-pass f32 W contraction
                # that follows); coords stay 3-limb exact.
                hdr = nxa[:8] + nxa[c4 : c4 + 8]
                limb3 = nxa[c4 + 8 : c4 + 16]
                feats_rows = nxa[8:c4]
            for j in range(hb_cur):
                h = h0 + j
                sl = slice(j * _T, (j + 1) * _T)
                rxyz_ref[0, h] = hdr[0, sl] + limb3[0, sl] - q3_ref[0]
                rxyz_ref[1, h] = hdr[1, sl] + limb3[1, sl] - q3_ref[1]
                rxyz_ref[2, h] = hdr[2, sl] + limb3[2, sl] - q3_ref[2]
                nx_ref[h] = feats_rows[:, sl]

                # Per-neighbor feature sums for the count heuristic come
                # from the precomputed f32 header row 4 (~f32-exact with
                # its third limb) — NOT from summing the bf16 feature
                # rows, whose rounding flips the >0 test for near-zero
                # sums.
                hsum_ref[h, :] += hdr[4, sl] + limb3[4, sl]

        # 3. Influence weights from the VMEM-resident rel planes — rel is
        # identical across jc (every channel block carries the same
        # coordinate header), so once per group suffices.
        @pl.when(jc == 0)
        def _():
            _compute_wgt(
                rxyz_ref[0], rxyz_ref[1], rxyz_ref[2], kp_ref, wgt_ref,
                kp_extent=kp_extent, influence=influence,
                aggregation=aggregation, k_count=k_count,
            )

        for k in range(k_count):
            acc_ref[k] = jnp.zeros_like(acc_ref[0])

        def h_step(h, _):
            nxh = nx_ref[h]  # [c_blk, T]
            for k in range(k_count):
                acc_ref[k] += wgt_ref[k, h][None, :] * nxh
            return 0

        jax.lax.fori_loop(0, h_count, h_step, 0)

    # nn is finalized on its block's FINAL visit; hsum lives in scratch so
    # it is complete from (jc == c_tiles-1, jd == 0) onward.
    @pl.when(jnp.logical_and(last_d, jc == c_tiles - 1))
    def _():
        count = jnp.sum((hsum_ref[:] > 0.0).astype(jnp.float32), axis=0)
        nn_ref[:] = jnp.maximum(count, 1.0)[:, None]

    out = jax.lax.dot_general(
        acc_ref[0], w_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    for k in range(1, k_count):
        out += jax.lax.dot_general(
            acc_ref[k], w_ref[k], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if c_tiles == 1:
        # Each out block is visited exactly once — write it directly.
        out_ref[:] = out.astype(out_ref.dtype)
    else:
        @pl.when(jc == 0)
        def _():
            outacc_ref[jd] = out

        @pl.when(jnp.logical_and(jc > 0, jc < c_tiles - 1))
        def _():
            outacc_ref[jd] += out

        @pl.when(jc == c_tiles - 1)
        def _():
            out_ref[:] = (outacc_ref[jd] + out).astype(out_ref.dtype)

    if save_residuals:
        # Same final-visit rule: the nx block for channel block jc is last
        # visited on the last d step (nx_ref holds the same recomputed rows
        # there); the rel planes are identical across jc, written on the
        # very last step of the group.
        @pl.when(last_d)
        def _():
            nx_out_ref[:] = nx_ref[:]

        @pl.when(jnp.logical_and(last_d, jc == c_tiles - 1))
        def _():
            rx_out_ref[:] = rxyz_ref[0]
            ry_out_ref[:] = rxyz_ref[1]
            rz_out_ref[:] = rxyz_ref[2]


def _split_hi_lo(x: jnp.ndarray) -> jnp.ndarray:
    """f32 [C, N] -> bf16 [2C, N] (hi rows then lo rows).

    The split uses BIT MASKING, not dtype round-trips: XLA's
    excess-precision simplifier folds ``x - f32(bf16(x))`` to zero inside
    jit, silently destroying the lo correction (observed on the axon TPU
    backend).  Masking the low 16 mantissa bits gives an exactly
    bf16-representable hi, an exact f32 lo = x - hi, and survives every
    compiler simplification."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi_f32 = jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFF0000), jnp.float32
    )
    lo = x - hi_f32
    return jnp.concatenate(
        [hi_f32.astype(jnp.bfloat16), lo.astype(jnp.bfloat16)], axis=0
    )


def _rne_bf16_value(x: jnp.ndarray) -> jnp.ndarray:
    """bf16 round-to-nearest-even of f32 ``x``, returned as f32 — computed
    in INTEGER math so no convert-folding pass can replace it with ``x``
    (finite inputs only)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    rounded = (bits + jnp.uint32(0x7FFF) + ((bits >> 16) & jnp.uint32(1))) & jnp.uint32(
        0xFFFF0000
    )
    return jax.lax.bitcast_convert_type(rounded, jnp.float32)


def _third_limb(x: jnp.ndarray) -> jnp.ndarray:
    """The residual beyond the 2-limb split: x - hi - bf16(lo), as bf16.
    hi+lo recombination is ~2^-16 relative; adding this limb reaches
    ~2^-24 (f32-exact for practical purposes) — used for the COORD rows,
    whose precision drives the influence weights."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi_f32 = jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFF0000), jnp.float32
    )
    lo = x - hi_f32
    # bf16-rounded lo, exactly as _split_hi_lo stores it (same RNE), but
    # via integer math so the subtraction below cannot be folded away.
    return (lo - _rne_bf16_value(lo)).astype(jnp.bfloat16)


def kpconv_tiled(
    q_pts: jnp.ndarray,  # [Nq, 3]
    s_pts: jnp.ndarray,  # [Ns, 3] (Z-order sorted — same order the search saw)
    s_feats: jnp.ndarray,  # [Ns, C] (or [Ns,1] ones)
    lidx: jnp.ndarray,  # [G*T, H] from radius_search_tiled(return_local=True)
    tiles: jnp.ndarray,  # [G, M]
    kernel_points: jnp.ndarray,  # [K, 3]
    weights: jnp.ndarray,  # [K, C, D]
    kp_extent: float,
    influence: str = "linear",
    aggregation: str = "sum",
    interpret: bool = False,
    save_residuals: bool = False,
    tile: int = 128,
    feat_limbs: int = 2,
):
    """Candidate-DMA fused KPConv forward.  Returns (out [Nq, D] BEFORE the
    neighbor-count division, nn [Nq] f32); with ``save_residuals`` also
    (nx [H, C8, Gp*T], rel planes 3x[H, Gp*T]) for the backward.

    ``feat_limbs``: bf16 limbs for the FEATURE rows of the one-hot E
    matmul (coords always use 3 limbs).  2 = hi/lo, ~2^-16 relative
    (training/parity default); 1 = single limb, ~2^-9 relative — the same
    error grade as the Mosaic one-bf16-pass f32 W contraction that
    follows, and ~40% fewer E-matmul MACs (the forward's dominant cost)."""
    assert feat_limbs in (1, 2), feat_limbs
    nq = q_pts.shape[0]
    ns = s_pts.shape[0]
    k_count, c_in, d = weights.shape
    h_count = lidx.shape[1]
    m_tiles = tiles.shape[1]
    g_count = tiles.shape[0]

    # Channel blocking: a SINGLE block up to _C_SINGLE_MAX input channels
    # (each extra c block repays the whole one-hot E build); wider layers
    # (C = 256/512 at upper pyramid levels) run 128-row c_tiles blocks per
    # group, each carrying its own 8 coordinate header rows.
    if c_in <= _C_SINGLE_MAX:
        c8 = max(8, ((c_in + 7) // 8) * 8)
    else:
        c8 = ((c_in + 127) // 128) * 128
    c_blk = min(c8, 128) if c8 > _C_SINGLE_MAX else c8
    c_tiles = c8 // c_blk

    # Support rows, padded to the search's tile grid: per channel block
    # [xyz | 5 pad rows | c_blk features], all in ONE bf16 hi/lo array
    # (see _build_kernel).
    ns_pad = ((ns + tile - 1) // tile) * tile
    base = jnp.zeros((8 + c8, ns_pad), jnp.float32)
    base = base.at[:3, :ns].set(s_pts.T.astype(jnp.float32))
    base = base.at[3, :ns].set(1.0)
    base = base.at[8 : 8 + c_in, :ns].set(s_feats.T.astype(jnp.float32))
    # Header row 4 carries the per-channel-block FEATURE SUM in f32 (set
    # per block below): the neighbor-count heuristic (feat-sum > 0,
    # reference blocks.py:369-372) must not flip sign to bf16 rounding of
    # near-zero sums — summing the bf16 feature rows in-kernel did exactly
    # that with feat_limbs=1.  Row 4 rides the same 2/3-limb split as the
    # coordinate rows, so the recombined sum is ~f32-exact.
    # Per block: [2*(8+c_blk) + 8] bf16 rows — hi rows, lo rows, then a
    # third limb for the coord rows (geometry must stay ~f32-exact).
    header = base[:8]
    blocks = []
    for jc in range(c_tiles):
        feats_blk = base[8 + jc * c_blk : 8 + (jc + 1) * c_blk]
        hdr_jc = header.at[4].set(jnp.sum(feats_blk, axis=0))
        blk = jnp.concatenate([hdr_jc, feats_blk], axis=0)
        if feat_limbs == 2:
            packed = jnp.concatenate(
                [_split_hi_lo(blk), _third_limb(hdr_jc)], axis=0
            )
        else:
            hl = _split_hi_lo(blk)  # [2*(8+c_blk), Ns_pad]
            packed = jnp.concatenate(
                [hl[: 8 + c_blk],                  # hi of header + features
                 hl[8 + c_blk : 8 + c_blk + 8],    # lo of header only
                 _third_limb(hdr_jc)], axis=0,
            )
        blocks.append(packed)
    supa = jnp.stack(blocks, axis=0)  # [c_tiles, rows, Ns_pad]
    rows = supa.shape[1]
    rows_pad = ((rows + 15) // 16) * 16  # bf16 sublane tiling
    if rows != rows_pad:
        supa = jnp.pad(supa, ((0, 0), (0, rows_pad - rows), (0, 0)))
    # Tile-major layout: [n_tiles, c_tiles, rows, tile] — one contiguous
    # burst per (tile, channel block).
    supa = supa.reshape(c_tiles, rows_pad, ns_pad // tile, tile).transpose(
        2, 0, 1, 3
    )

    w8 = weights
    if c_in != c8:
        w8 = jnp.pad(weights, ((0, 0), (0, c8 - c_in), (0, 0)))
    d_pad = max(128, ((d + 127) // 128) * 128)
    if d_pad > 256:
        # Output blocked at 256 lanes: d_pad must divide evenly.
        d_pad = ((d_pad + 255) // 256) * 256
    if d != d_pad:
        w8 = jnp.pad(w8, ((0, 0), (0, 0), (0, d_pad - d)))
    d_blk = min(d_pad, 256)
    d_tiles = d_pad // d_blk

    nq_pad = g_count * _T
    q3 = jnp.zeros((4, nq_pad), jnp.float32)
    q3 = q3.at[:3, :nq].set(q_pts.T)
    lidx_t = lidx.reshape(g_count, _T, h_count).transpose(0, 2, 1)  # [G, H, T]

    kernel = functools.partial(
        _build_kernel,
        kp_extent=float(kp_extent),
        influence=influence,
        aggregation=aggregation,
        k_count=k_count,
        m_tiles=m_tiles,
        tile=tile,
        h_count=h_count,
        save_residuals=save_residuals,
        c_tiles=c_tiles,
        d_tiles=d_tiles,
        feat_limbs=feat_limbs,
    )
    cand = m_tiles * tile
    res_shape = (h_count, c8, nq_pad) if save_residuals else (1, 1, 1)
    plane_shape = (h_count, nq_pad) if save_residuals else (1, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g_count, c_tiles, d_tiles),
        in_specs=[
            pl.BlockSpec((4, _T), lambda g, jc, jd, t: (0, g)),
            pl.BlockSpec((1, h_count, _T), lambda g, jc, jd, t: (g, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((k_count, 3), lambda g, jc, jd, t: (0, 0)),
            pl.BlockSpec((k_count, c_blk, d_blk), lambda g, jc, jd, t: (0, jc, jd)),
        ],
        out_specs=[
            pl.BlockSpec((_T, d_blk), lambda g, jc, jd, t: (g, jd)),
            pl.BlockSpec((_T, 1), lambda g, jc, jd, t: (g, 0)),
            pl.BlockSpec(
                (res_shape[0], min(res_shape[1], c_blk), _T if save_residuals else 1),
                (lambda g, jc, jd, t: (0, jc, g)) if save_residuals
                else (lambda g, jc, jd, t: (0, 0, 0)),
            ),
            pl.BlockSpec(
                (plane_shape[0], _T if save_residuals else 1),
                (lambda g, jc, jd, t: (0, g)) if save_residuals
                else (lambda g, jc, jd, t: (0, 0)),
            ),
            pl.BlockSpec(
                (plane_shape[0], _T if save_residuals else 1),
                (lambda g, jc, jd, t: (0, g)) if save_residuals
                else (lambda g, jc, jd, t: (0, 0)),
            ),
            pl.BlockSpec(
                (plane_shape[0], _T if save_residuals else 1),
                (lambda g, jc, jd, t: (0, g)) if save_residuals
                else (lambda g, jc, jd, t: (0, 0)),
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows_pad, cand), jnp.bfloat16),
            pltpu.VMEM((h_count, c_blk, _T), jnp.float32),
            pltpu.VMEM((3, h_count, _T), jnp.float32),
            pltpu.VMEM((k_count, h_count, _T), jnp.float32),
            pltpu.VMEM((k_count, c_blk, _T), jnp.float32),
            pltpu.VMEM((h_count, _T), jnp.float32),
            # Cross-jc out accumulator (only touched when c_tiles > 1).
            pltpu.VMEM(
                (d_tiles, _T, d_blk) if c_tiles > 1 else (1, 1, 1),
                jnp.float32,
            ),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out, nn, nx_res, rx_res, ry_res, rz_res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nq_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((nq_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct(res_shape, jnp.float32),
            jax.ShapeDtypeStruct(plane_shape, jnp.float32),
            jax.ShapeDtypeStruct(plane_shape, jnp.float32),
            jax.ShapeDtypeStruct(plane_shape, jnp.float32),
        ],
        interpret=interpret,
    )(tiles, q3, lidx_t, supa,
      kernel_points.astype(jnp.float32), w8.astype(jnp.float32))
    out = out[:nq, :d]
    nn = nn[:nq, 0]
    if save_residuals:
        return out, nn, (nx_res, rx_res, ry_res, rz_res)
    return out, nn


def _dcand_kernel(lidx_ref, dnx_ref, out_ref, acc_ref, *, h_count, cand):
    """Per query group: dcand[c, j] = sum over (h, t) with lidx[h,t]==j of
    dnx[h, c, t] — the TRANSPOSED one-hot matmul of the forward's gather.
    Turning the row-level scatter into per-group candidate gradients makes
    the remaining HBM scatter tile-granular (G*M blocks instead of Nq*H
    rows; the [1M-row, C] segment_sum was ~15 ms at level 0).

    dnx rides the MXU as a bf16 hi/lo split (bit-masked IN-KERNEL — no XLA
    simplification pass can fold it) — exact to ~2^-16 relative."""
    acc_ref[:] = jnp.zeros_like(acc_ref)
    t = dnx_ref.shape[2]

    def h_step(h, _):
        dnx_h = dnx_ref[h]  # [C8, T] f32
        bits = jax.lax.bitcast_convert_type(dnx_h, jnp.uint32)
        hi = jax.lax.bitcast_convert_type(bits & jnp.uint32(0xFFFF0000), jnp.float32)
        lo = dnx_h - hi
        lblk = lidx_ref[0, h]  # [T]
        eh = (
            jax.lax.broadcasted_iota(jnp.int32, (t, cand), 1) == lblk[:, None]
        ).astype(jnp.bfloat16)  # [T, CAND]
        for part in (hi, lo):
            acc_ref[:] += jax.lax.dot_general(
                part.astype(jnp.bfloat16), eh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return 0

    jax.lax.fori_loop(0, h_count, h_step, 0)
    out_ref[0] = acc_ref[:]


def _tile_block_scatter(dcand, tiles, ns, c_in, tile):
    """dcand [G, C8, M*tile] per-group candidate grads -> ds [ns, c_in],
    accumulated at TILE granularity (G*M blocks instead of Nq*H rows).

    The accumulation itself is a one-hot MXU matmul, NOT a segment_sum:
    XLA lowers the [G*M, tile*C8] segment_sum to a sequential
    dynamic-update-slice while-loop (~24 ms at level 0, traced).  The
    selection matrix is exact 0/1 and the values ride as bf16 hi/lo limbs,
    so each output element is an exact f32 sum of bf16-split inputs."""
    g_count, c8, cand = dcand.shape
    m_tiles = tiles.shape[1]
    ns_pad = ((ns + tile - 1) // tile) * tile
    n_tiles = ns_pad // tile
    dc = (
        dcand.transpose(0, 2, 1)
        .reshape(g_count, m_tiles, tile, c8)
        .reshape(g_count * m_tiles, tile * c8)
    )
    sel = (
        tiles.reshape(-1)[None, :]
        == jax.lax.broadcasted_iota(jnp.int32, (n_tiles, 1), 0)
    ).astype(jnp.bfloat16)  # [n_tiles, G*M]
    dc_hl = _split_hi_lo(dc)  # [2*G*M, tile*C8] bf16 (hi rows then lo rows)
    seg = jax.lax.dot_general(
        jnp.concatenate([sel, sel], axis=1), dc_hl,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    return seg.reshape(ns_pad, c8)[:ns, :c_in]


def _scatter_ds_feats(dnx_t, lidx, tiles, ns, c_in, tile, interpret=False):
    """dnx_t [H, C8, Gp*T] (group-padded), lidx [Gp*T, H], tiles [G, M] ->
    ds_feats [ns, c_in] via per-group dcand + tile-block segment-sum."""
    h_count, c8, nq_pad = dnx_t.shape
    g_count, m_tiles = tiles.shape
    cand = m_tiles * tile
    # Mirror the forward's blocking: single block up to _C_SINGLE_MAX
    # (c8 // 128 would silently DROP channels 128..c8-1 for c8 = 136).
    c_blk = min(c8, 128) if c8 > _C_SINGLE_MAX else c8
    lidx_t = lidx.reshape(g_count, _T, h_count).transpose(0, 2, 1)  # [G,H,T]

    dcand = pl.pallas_call(
        functools.partial(_dcand_kernel, h_count=h_count, cand=cand),
        grid=(g_count, c8 // c_blk),
        in_specs=[
            pl.BlockSpec((1, h_count, _T), lambda g, jc: (g, 0, 0)),
            pl.BlockSpec((h_count, c_blk, _T), lambda g, jc: (0, jc, g)),
        ],
        out_specs=pl.BlockSpec((1, c_blk, cand), lambda g, jc: (g, jc, 0)),
        out_shape=jax.ShapeDtypeStruct((g_count, c8, cand), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c_blk, cand), jnp.float32)],
        interpret=interpret,
    )(lidx_t, dnx_t)
    return _tile_block_scatter(dcand, tiles, ns, c_in, tile)


def _maxpool_bwd_kernel(lidx_ref, amax_ref, g_ref, out_ref, acc_ref, *,
                        h_count, cand):
    """Shortcut max-pool backward without value re-materialization: the
    forward saved argmax-h per (query, channel); grad for candidate j is
    the sum of g[q, c] over (q, c) with lidx[q, amax[q, c]] == j.  Per h:
    mask channels whose argmax is h, then the transposed one-hot matmul —
    same E structure as _dcand_kernel, zero gathers, zero row scatters."""
    acc_ref[:] = jnp.zeros_like(acc_ref)
    t = g_ref.shape[1]

    def h_step(h, _):
        rows = jnp.where(amax_ref[:] == h, g_ref[:], 0.0)  # [c_blk, T]
        bits = jax.lax.bitcast_convert_type(rows, jnp.uint32)
        hi = jax.lax.bitcast_convert_type(bits & jnp.uint32(0xFFFF0000), jnp.float32)
        lo = rows - hi
        lblk = lidx_ref[0, h]
        eh = (
            jax.lax.broadcasted_iota(jnp.int32, (t, cand), 1) == lblk[:, None]
        ).astype(jnp.bfloat16)
        for part in (hi, lo):
            acc_ref[:] += jax.lax.dot_general(
                part.astype(jnp.bfloat16), eh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return 0

    jax.lax.fori_loop(0, h_count, h_step, 0)
    out_ref[0] = acc_ref[:]


_MAXPOOL_CORE_CACHE: dict = {}


def max_pool_tiled(x, inds, lidx, tiles, tile: int = 128, interpret: bool = False):
    """Strided-shortcut max-pool with a tile-scatter backward.

    Forward is the standard gather + max over neighbors (shadow rows are
    zero, reference models/blocks.py:86-103).  Backward routes the grad to
    the saved argmax neighbor (first-winner subgradient) and accumulates
    per support TILE via _maxpool_bwd_kernel — replacing the [Nq*H, C]
    row scatter that was the train step's single largest op (12 ms at
    level 0)."""
    key = (tile, interpret)
    core = _MAXPOOL_CORE_CACHE.get(key)
    if core is None:
        core = _make_maxpool_core(tile, interpret)
        _MAXPOOL_CORE_CACHE[key] = core
    return core(x, inds, lidx, tiles)


def _make_maxpool_core(tile, interpret):
    import numpy as _np

    from pcrcg_tpu.ops.masked import pad_gather

    @jax.custom_vjp
    def core(x, inds, lidx, tiles):
        return jnp.max(pad_gather(x, inds, 0.0), axis=1)

    def core_fwd(x, inds, lidx, tiles):
        gathered = pad_gather(x, inds, 0.0)  # [Nq, H, C]
        amax = jnp.argmax(gathered, axis=1).astype(jnp.int32)  # [Nq, C]
        out = jnp.max(gathered, axis=1)
        # x rides along for shape/dtype only (alive anyway — the block
        # also feeds it to the shortcut unary); inds only for its shape.
        return out, (amax, lidx, tiles, x, inds)

    def core_bwd(saved, g):
        amax, lidx, tiles, x, inds = saved
        x_dtype = x.dtype
        inds_shape = inds.shape
        ns, c = x.shape
        nq, h_count = inds_shape
        g_count, m_tiles = tiles.shape
        cand = m_tiles * tile
        nq_pad = g_count * _T
        c8 = max(8, ((c + 7) // 8) * 8)
        c_blk = min(c8, 128)

        # [C8, Nq_pad] transposed layouts (T on lanes, like every kernel).
        amax_t = jnp.full((c8, nq_pad), -1, jnp.int32).at[:c, :nq].set(amax.T)
        g_t = jnp.zeros((c8, nq_pad), jnp.float32).at[:c, :nq].set(
            g.astype(jnp.float32).T
        )
        lidx_t = lidx.reshape(g_count, _T, h_count).transpose(0, 2, 1)

        dcand = pl.pallas_call(
            functools.partial(_maxpool_bwd_kernel, h_count=h_count, cand=cand),
            grid=(g_count, c8 // c_blk),
            in_specs=[
                pl.BlockSpec((1, h_count, _T), lambda g_, jc: (g_, 0, 0)),
                pl.BlockSpec((c_blk, _T), lambda g_, jc: (jc, g_)),
                pl.BlockSpec((c_blk, _T), lambda g_, jc: (jc, g_)),
            ],
            out_specs=pl.BlockSpec((1, c_blk, cand), lambda g_, jc: (g_, jc, 0)),
            out_shape=jax.ShapeDtypeStruct((g_count, c8, cand), jnp.float32),
            scratch_shapes=[pltpu.VMEM((c_blk, cand), jnp.float32)],
            interpret=interpret,
        )(lidx_t, amax_t, g_t)
        ds = _tile_block_scatter(dcand, tiles, ns, c, tile)
        f0 = jax.dtypes.float0
        return (
            ds.astype(x_dtype),
            _np.zeros(inds_shape, f0),
            _np.zeros(lidx.shape, f0),
            _np.zeros(tiles.shape, f0),
        )

    core.defvjp(core_fwd, core_bwd)
    return core


def kpconv_tiled_ad(
    q_pts, s_pts, s_feats, lidx, tiles, gidx, kernel_points, weights,
    kp_extent, influence="linear", aggregation="sum", interpret=False,
    tile: int = 128, feat_limbs: int = 2,
):
    """Differentiable candidate-DMA KPConv: gradients flow to ``s_feats``
    and ``weights`` only (geometry/indices are fixed, like every KPConv
    path here — reference blocks.py:226).  ``gidx`` [Nq, H] are the GLOBAL
    neighbor indices (pad = Ns) for the backward's scatter-add.

    Every array is an EXPLICIT custom_vjp argument — closure-captured
    tracers leak across the grad trace under lax.map (observed
    UnexpectedTracerError); non-differentiable inputs get zero / float0
    cotangents."""
    import numpy as _np

    key = (kp_extent, influence, aggregation, interpret, tile, feat_limbs)
    core = _TILED_CORE_CACHE.get(key)
    if core is None:
        core = _make_tiled_core(
            kp_extent, influence, aggregation, interpret, tile, feat_limbs
        )
        _TILED_CORE_CACHE[key] = core
    return core(
        jax.lax.stop_gradient(q_pts),
        jax.lax.stop_gradient(s_pts),
        s_feats,
        lidx, tiles, gidx,
        jax.lax.stop_gradient(kernel_points),
        weights,
    )


_TILED_CORE_CACHE: dict = {}


def _make_tiled_core(kp_extent, influence, aggregation, interpret, tile,
                     feat_limbs=2):
    import numpy as _np

    @jax.custom_vjp
    def core(q_pts, s_pts, feats, lidx, tiles, gidx, kp, w):
        return kpconv_tiled(
            q_pts, s_pts, feats, lidx, tiles, kp, w,
            kp_extent, influence, aggregation, interpret=interpret, tile=tile,
            feat_limbs=feat_limbs,
        )

    def core_fwd(q_pts, s_pts, feats, lidx, tiles, gidx, kp, w):
        out, nn, res = kpconv_tiled(
            q_pts, s_pts, feats, lidx, tiles, kp, w,
            kp_extent, influence, aggregation, interpret=interpret, tile=tile,
            feat_limbs=feat_limbs, save_residuals=True,
        )
        meta = (q_pts.shape[0], feats.shape[0], feats.shape[1], lidx.shape[1],
                w.shape[2], lidx.shape, tiles.shape, gidx.shape)
        return (out, nn), (res, w, kp, lidx, tiles, meta)

    def core_bwd(saved, cots):
        (nx_res, rx, ry, rz), w, kp, lidx, tiles, meta = saved
        nq, ns, c_in, h_count, d, lidx_shape, tiles_shape, gidx_shape = meta
        g, _g_nn = cots
        c8 = nx_res.shape[1]
        w8 = w
        if c_in != c8:
            w8 = jnp.pad(w, ((0, 0), (0, c8 - c_in), (0, 0)))
        g_pad = jnp.zeros((nx_res.shape[2], d), jnp.float32).at[:nq].set(
            g.astype(jnp.float32)
        )
        dnx_t, dw = _bwd_from_planes(
            (rx, ry, rz), nx_res, g_pad, kp, w8,
            kp_extent, influence, aggregation, interpret=interpret,
        )
        # dnx [H, C8, Nq_pad] -> per-group transposed one-hot matmul, then a
        # tile-granular block scatter (_scatter_ds_feats; the row-level
        # segment_sum over Nq*H rows was the train step's top scatter cost).
        ds_feats = _scatter_ds_feats(
            dnx_t[:h_count], lidx, tiles, ns, c_in, tile, interpret=interpret,
        )
        f0 = jax.dtypes.float0
        return (
            jnp.zeros((nq, 3), jnp.float32),      # q_pts
            jnp.zeros((ns, 3), jnp.float32),      # s_pts
            ds_feats.astype(jnp.float32),         # feats
            _np.zeros(lidx_shape, f0),            # lidx (int -> float0)
            _np.zeros(tiles_shape, f0),           # tiles
            _np.zeros(gidx_shape, f0),            # gidx
            jnp.zeros_like(kp),                   # kernel points
            dw[:, :c_in, :].astype(w.dtype),      # weights
        )

    core.defvjp(core_fwd, core_bwd)
    return core
