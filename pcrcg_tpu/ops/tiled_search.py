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
        d2k, lidx = _smallest_k(d2, k, exact=exact)
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
