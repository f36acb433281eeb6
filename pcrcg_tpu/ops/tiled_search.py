"""Tile-pruned radius search: Morton-local support tiles + AABB pruning.

The dense search (ops/neighbors.py) materializes a [chunk, N_support]
distance matrix per query chunk — ~5.7 GB of HBM traffic per pyramid at
level 0 (traced; the dominant pyramid cost).  Real scans are surfaces:
when both queries and supports are sorted in Z-order (ops/subsample.py
``morton_sort``), small support tiles are spatially compact, and for a
128-query group only the few tiles whose bounding boxes come within
``radius`` of the group's box can contribute.  We keep the ``m_tiles``
closest tiles — box distance first, box-center distance as tie-break (ties
at zero box distance are common on large surfaces) — and run the exact
dense search against just those candidates: ~8× less distance traffic and
a much smaller top-k.

Semantics match ops/neighbors.radius_search (reference nanoflann search,
cpp_neighbors/neighbors.cpp:211-332): ascending distance order, shadow
index = len(supports), radius cutoff.  The pruning is exact for any query
group whose within-radius support tiles number ≤ m_tiles, and falls back
to the dense path when the tile grid is too small to prune.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from pcrcg_tpu.ops.masked import PAD_COORD
from pcrcg_tpu.ops.neighbors import _smallest_k, _pad_rows, min_dist_sq, radius_search

_HIGH = jax.lax.Precision.HIGHEST
_Q_TILE = 128  # queries per pruning group


def radius_search_tiled(
    queries: jnp.ndarray,
    supports: jnp.ndarray,
    support_mask: jnp.ndarray,
    radius: float,
    k: int,
    tile: int = 128,
    m_tiles: int = 16,
    query_chunk: int = 1024,
    exact: bool = False,
    recall_target: float = 0.95,
    return_local: bool = False,
):
    """queries [Nq,3], supports [Ns,3] (both Z-order sorted), support_mask
    [Ns] -> idx [Nq,k] int32 in [0, Ns] (Ns = shadow), ascending distance.

    With ``return_local`` also returns the tile-relative form consumed by
    the candidate-DMA KPConv kernel (ops/kpconv_tiled.py):
      lidx  [Nq, k] int32 — position of each neighbor inside its query
            group's candidate block (m_tiles·tile entries; shadow =
            m_tiles·tile);
      tiles [Nq/128, m_tiles] int32 — the candidate tile ids per group.
    Returns (idx, lidx, tiles); on the dense fallback (cloud too small to
    prune) the metadata lists ALL tiles per group (identity local indices,
    exact)."""
    nq = queries.shape[0]
    ns = supports.shape[0]

    sup = _pad_rows(supports, tile, PAD_COORD)
    smask = _pad_rows(support_mask, tile, False)
    n_tiles = sup.shape[0] // tile
    if n_tiles <= m_tiles:
        # Nothing to prune — the dense search is already minimal.  Still
        # emit candidate metadata when asked: ALL tiles are candidates, so
        # local indices are the global ones (identity, exact) — this keeps
        # the candidate-DMA KPConv kernel available at small upper pyramid
        # levels (L3's 6 tiles at bench sizes) where pruning is moot.
        dense = radius_search(queries, supports, support_mask, radius, k, query_chunk)
        if not return_local:
            return dense
        g_count = (nq + _Q_TILE - 1) // _Q_TILE
        nq_pad = g_count * _Q_TILE
        idx_p = jnp.full((nq_pad, k), ns, jnp.int32).at[:nq].set(dense)
        shadow = jnp.int32(n_tiles * tile)
        lidx = jnp.where(idx_p == ns, shadow, idx_p).astype(jnp.int32)
        tiles_all = jnp.broadcast_to(
            jnp.arange(n_tiles, dtype=jnp.int32)[None, :], (g_count, n_tiles)
        )
        return dense, lidx, tiles_all

    sup_tiles = sup.reshape(n_tiles, tile, 3)
    tmask = smask.reshape(n_tiles, tile)
    big = jnp.float32(PAD_COORD)
    tmin = jnp.min(jnp.where(tmask[..., None], sup_tiles, big), axis=1)  # [T,3]
    tmax = jnp.max(jnp.where(tmask[..., None], sup_tiles, -big), axis=1)
    tctr = 0.5 * (tmin + tmax)
    tile_valid = jnp.any(tmask, axis=1)
    sup_sq = jnp.sum(sup * sup, axis=-1)
    sup_sq = jnp.where(smask, sup_sq, jnp.inf)
    sup_sq_tiles = sup_sq.reshape(n_tiles, tile)

    chunk = max(_Q_TILE, (min(query_chunk, nq) // _Q_TILE) * _Q_TILE)
    r2 = jnp.float32(radius) ** 2

    def one_group(q):  # [_Q_TILE, 3]
        qvalid = jnp.abs(q[:, 0]) < big * 0.5
        qmin = jnp.min(jnp.where(qvalid[:, None], q, big), axis=0)  # [3]
        qmax = jnp.max(jnp.where(qvalid[:, None], q, -big), axis=0)
        qctr = 0.5 * (qmin + qmax)
        # Box-to-box distance group AABB <-> tile AABBs; center distance
        # breaks the (frequent) zero-gap ties so enclosing/overlapping
        # tiles always win over distant ones.
        gap = jnp.maximum(
            jnp.maximum(tmin - qmax[None, :], qmin[None, :] - tmax), 0.0
        )
        box_d2 = jnp.sum(gap * gap, axis=-1)
        ctr_d2 = jnp.sum((tctr - qctr[None, :]) ** 2, axis=-1)
        score = box_d2 + 1e-3 * ctr_d2
        score = jnp.where(tile_valid, score, jnp.inf)
        _, sel = jax.lax.top_k(-score, m_tiles)  # nearest tiles first

        cand = sup_tiles[sel].reshape(m_tiles * tile, 3)  # contiguous tiles
        cand_sq = sup_sq_tiles[sel].reshape(-1)
        d2 = (
            jnp.sum(q * q, axis=-1)[:, None]
            + cand_sq[None, :]
            - 2.0 * jnp.matmul(q, cand.T, precision=_HIGH)
        )
        d2k, lidx = _smallest_k(d2, k, exact=exact, recall_target=recall_target)
        # Tile-local -> global: resolve the 24-entry tile table with a
        # compare-select sum, NOT sel[lidx // tile] — that tiny table
        # lookup compiles to a latency-bound row gather (~6 ns/row) and
        # was ~30 ms/pyramid at bench sizes (traced).
        m_of = lidx // tile
        tile_base = jnp.zeros_like(lidx)
        for m in range(m_tiles):
            tile_base = tile_base + jnp.where(m_of == m, sel[m] * tile, 0)
        gidx = tile_base + lidx % tile
        idx = jnp.where(d2k <= r2, gidx, ns).astype(jnp.int32)
        lidx = jnp.where(d2k <= r2, lidx, m_tiles * tile).astype(jnp.int32)
        return idx, lidx, sel.astype(jnp.int32)

    def one_chunk(qc):  # [chunk, 3]
        return jax.vmap(one_group)(qc.reshape(-1, _Q_TILE, 3))

    padded = _pad_rows(queries, chunk, PAD_COORD)
    out, lout, tout = jax.lax.map(one_chunk, padded.reshape(-1, chunk, 3))
    idx = out.reshape(-1, k)[:nq]
    if not return_local:
        return idx
    # Keep the group-padded forms: the kernel runs over ceil(Nq/128) full
    # groups (pad queries land at PAD_COORD and select shadow everywhere).
    return idx, lout.reshape(-1, k), tout.reshape(-1, m_tiles)


def _group_tile_selection(
    q_groups: jnp.ndarray,  # [..., G, _Q_TILE, 3]
    tmin: jnp.ndarray,  # [..., n_tiles, 3]
    tmax: jnp.ndarray,
    tctr: jnp.ndarray,
    tile_valid: jnp.ndarray,  # [..., n_tiles]
    m_tiles: int,
) -> jnp.ndarray:
    """Vectorized nearest-tile selection (box distance + center tie-break,
    same math as ``one_group`` above) -> sel [..., G, m_tiles] int32."""
    big = jnp.float32(PAD_COORD)
    qvalid = jnp.abs(q_groups[..., 0]) < big * 0.5  # [..., G, T]
    qmin = jnp.min(jnp.where(qvalid[..., None], q_groups, big), axis=-2)
    qmax = jnp.max(jnp.where(qvalid[..., None], q_groups, -big), axis=-2)
    qctr = 0.5 * (qmin + qmax)  # [..., G, 3]
    gap = jnp.maximum(
        jnp.maximum(
            tmin[..., None, :, :] - qmax[..., :, None, :],
            qmin[..., :, None, :] - tmax[..., None, :, :],
        ),
        0.0,
    )  # [..., G, n_tiles, 3]
    score = jnp.sum(gap * gap, axis=-1) + 1e-3 * jnp.sum(
        (tctr[..., None, :, :] - qctr[..., :, None, :]) ** 2, axis=-1
    )
    score = jnp.where(tile_valid[..., None, :], score, jnp.inf)
    _, sel = jax.lax.top_k(-score, m_tiles)
    return sel.astype(jnp.int32)


def radius_search_tiled_batch(
    queries: jnp.ndarray,  # [B, Nq, 3] (Z-order sorted per cloud)
    supports: jnp.ndarray,  # [B, Ns, 3] (Z-order sorted per cloud)
    support_mask: jnp.ndarray,  # [B, Ns]
    radius: float,
    k: int,
    tile: int = 128,
    m_tiles: int = 16,
    exact: bool = False,
    recall_target: float = 0.95,
    return_local: bool = False,
    interpret: bool = False,
):
    """Batched tiled search through the candidate-DMA distance kernel
    (ops/search_kernel.py) — ONE Pallas dispatch for all B clouds (the
    scalar-prefetch grid doesn't vmap, so the clouds stack with per-cloud
    tile-id offsets, like the KPConv batching in models/kpconv.py).

    Replaces the lax.map-over-chunks XLA path whose ``sup_tiles[sel]``
    candidate gathers were ~12.6 ms per pyramid (latency-bound rows;
    perf_runs/session_r3b trace).  Same semantics as vmapping
    ``radius_search_tiled`` over the cloud axis; cross terms carry ~2⁻¹⁶
    relative error (bf16 limb expansion) instead of the XLA path's
    Precision.HIGHEST — micrometres at scan scale.

    Returns idx [B, Nq, k]; with ``return_local`` also lidx [B, Gp·128, k]
    and tiles [B, G, m_tiles] (per-cloud tile ids, like the per-cloud
    path)."""
    from pcrcg_tpu.ops.search_kernel import (
        pack_supports_tile_major,
        tiled_candidate_distances,
    )

    b, nq = queries.shape[:2]
    ns = supports.shape[1]

    sup = jax.vmap(lambda s: _pad_rows(s, tile, PAD_COORD))(supports)
    smask = jax.vmap(lambda m: _pad_rows(m, tile, False))(support_mask)
    n_tiles = sup.shape[1] // tile
    if n_tiles <= m_tiles:
        # Dense fallback per cloud (identical to the un-batched path).
        def one(q, s, m):
            return radius_search_tiled(
                q, s, m, radius, k, tile=tile, m_tiles=m_tiles,
                exact=exact, recall_target=recall_target,
                return_local=return_local,
            )

        return jax.vmap(one)(queries, supports, support_mask)

    sup_tiles = sup.reshape(b, n_tiles, tile, 3)
    tmask = smask.reshape(b, n_tiles, tile)
    big = jnp.float32(PAD_COORD)
    tmin = jnp.min(jnp.where(tmask[..., None], sup_tiles, big), axis=2)
    tmax = jnp.max(jnp.where(tmask[..., None], sup_tiles, -big), axis=2)
    tctr = 0.5 * (tmin + tmax)
    tile_valid = jnp.any(tmask, axis=2)

    g_count = (nq + _Q_TILE - 1) // _Q_TILE
    nq_pad = g_count * _Q_TILE
    qpad = jax.vmap(lambda q: _pad_rows(q, _Q_TILE, PAD_COORD))(queries)
    sel = _group_tile_selection(
        qpad.reshape(b, g_count, _Q_TILE, 3), tmin, tmax, tctr, tile_valid,
        m_tiles,
    )  # [B, G, M]

    # Stack clouds: tile ids offset by the cloud's tile base.
    boff = (jnp.arange(b, dtype=jnp.int32) * n_tiles)[:, None, None]
    supa = jax.vmap(
        lambda s, m: pack_supports_tile_major(s, m, tile)
    )(sup, smask).reshape(b * n_tiles, 8, tile)
    d2 = tiled_candidate_distances(
        qpad.reshape(b * nq_pad, 3), supa, (sel + boff).reshape(b * g_count, -1),
        tile=tile, interpret=interpret,
    )  # [B·Nq_pad, M·tile]

    d2k, lidx = _smallest_k(
        d2, k, exact=exact, recall_target=recall_target
    )  # [B·Nq_pad, k]
    d2k = d2k.reshape(b, nq_pad, k)
    lidx = lidx.reshape(b, g_count, _Q_TILE, k)

    # Tile-local -> global without a table gather (see one_group above).
    m_of = lidx // tile
    tile_base = jnp.zeros_like(lidx)
    for m in range(m_tiles):
        tile_base = tile_base + jnp.where(
            m_of == m, sel[:, :, m][:, :, None, None] * tile, 0
        )
    gidx = (tile_base + lidx % tile).reshape(b, nq_pad, k)
    lidx = lidx.reshape(b, nq_pad, k)

    r2 = jnp.float32(radius) ** 2
    in_r = d2k <= r2
    idx = jnp.where(in_r, gidx, ns).astype(jnp.int32)[:, :nq]
    if not return_local:
        return idx
    lidx = jnp.where(in_r, lidx, m_tiles * tile).astype(jnp.int32)
    return idx, lidx, sel


def min_dist_sq_tiled(
    queries: jnp.ndarray,
    supports: jnp.ndarray,
    support_mask: jnp.ndarray,
    tile: int = 128,
    m_tiles: int = 16,
    query_chunk: int = 2048,
) -> jnp.ndarray:
    """Per-query squared distance to the nearest valid support [Nq], with
    tile pruning.  SAFE ONLY for thresholded use (``min_d2 <= r²``): when
    the true nearest support is outside the m_tiles candidate tiles the
    returned value can be too large, but then the true value exceeds any
    small radius anyway (the tiles are ranked nearest-first)."""
    nq = queries.shape[0]
    sup = _pad_rows(supports, tile, PAD_COORD)
    smask = _pad_rows(support_mask, tile, False)
    n_tiles = sup.shape[0] // tile
    if n_tiles <= m_tiles:
        return min_dist_sq(queries, supports, support_mask, query_chunk)

    sup_tiles = sup.reshape(n_tiles, tile, 3)
    tmask = smask.reshape(n_tiles, tile)
    big = jnp.float32(PAD_COORD)
    tmin = jnp.min(jnp.where(tmask[..., None], sup_tiles, big), axis=1)
    tmax = jnp.max(jnp.where(tmask[..., None], sup_tiles, -big), axis=1)
    tctr = 0.5 * (tmin + tmax)
    tile_valid = jnp.any(tmask, axis=1)
    sup_sq = jnp.where(smask, jnp.sum(sup * sup, axis=-1), jnp.inf)
    sup_sq_tiles = sup_sq.reshape(n_tiles, tile)

    chunk = max(_Q_TILE, (min(query_chunk, nq) // _Q_TILE) * _Q_TILE)

    def one_group(q):  # [_Q_TILE, 3]
        qvalid = jnp.abs(q[:, 0]) < big * 0.5
        qmin = jnp.min(jnp.where(qvalid[:, None], q, big), axis=0)
        qmax = jnp.max(jnp.where(qvalid[:, None], q, -big), axis=0)
        qctr = 0.5 * (qmin + qmax)
        gap = jnp.maximum(
            jnp.maximum(tmin - qmax[None, :], qmin[None, :] - tmax), 0.0
        )
        score = jnp.sum(gap * gap, axis=-1) + 1e-3 * jnp.sum(
            (tctr - qctr[None, :]) ** 2, axis=-1
        )
        score = jnp.where(tile_valid, score, jnp.inf)
        _, sel = jax.lax.top_k(-score, m_tiles)
        cand = sup_tiles[sel].reshape(m_tiles * tile, 3)
        cand_sq = sup_sq_tiles[sel].reshape(-1)
        d2 = (
            jnp.sum(q * q, axis=-1)[:, None]
            + cand_sq[None, :]
            - 2.0 * jnp.matmul(q, cand.T, precision=_HIGH)
        )
        return jnp.min(d2, axis=-1)

    def one_chunk(qc):
        return jax.vmap(one_group)(qc.reshape(-1, _Q_TILE, 3))

    padded = _pad_rows(queries, chunk, PAD_COORD)
    out = jax.lax.map(one_chunk, padded.reshape(-1, chunk, 3))
    return out.reshape(-1)[:nq]
