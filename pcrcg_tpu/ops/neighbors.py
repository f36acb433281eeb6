"""Fixed-capacity radius / k-NN search, on device, static shapes.

TPU-native replacement for the reference's CPU nanoflann KD-tree search
(cpp_neighbors/neighbors.cpp:211-332) that ran inside DataLoader workers.
Semantics preserved:
* for each query, support indices within ``radius``,
* sorted by ascending distance (nanoflann ``sorted=true``,
  neighbors.cpp:266) — required by closest-pool / nearest-upsample
  (reference models/blocks.py:71-83),
* truncated to a fixed cap ``k`` and padded with the shadow index
  ``len(supports)`` (neighbors.cpp:324).

Implementation: tiled brute force.  Squared distances via the MXU-friendly
``|q|² + |s|² − 2 q·s`` expansion, processed in query chunks under
``lax.map`` so the [chunk, N_support] distance tile never exceeds a few
tens of MB, then ``top_k`` of the negated distances gives the ascending
neighbor list.  O(Nq·Ns) flops but they ride the MXU; a Pallas hash-grid
kernel can slot in behind the same API later.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from pcrcg_tpu.ops.masked import PAD_COORD

# Geometry must stay exact at millimeter scales on meter-sized scenes; the
# TPU's default (bf16-ish) matmul precision is not enough, so all distance
# matmuls run at HIGHEST (f32 accumulation through the MXU).
_HIGH = jax.lax.Precision.HIGHEST


def _sq_dists(q: jnp.ndarray, sup_t: jnp.ndarray, sup_sq: jnp.ndarray) -> jnp.ndarray:
    """[chunk,3] x [3,Ns] -> squared distances [chunk, Ns] (masked supports
    carry +inf via sup_sq)."""
    return (
        jnp.sum(q * q, axis=-1)[:, None]
        + sup_sq[None, :]
        - 2.0 * jnp.matmul(q, sup_t, precision=_HIGH)
    )


def _smallest_k(
    d2: jnp.ndarray, k: int, exact: bool = False, recall_target: float = 0.95
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k smallest entries per row, ascending: (values, indices).

    Uses ``lax.approx_min_k`` — the TPU-native bucketed top-k — instead of
    ``lax.top_k``'s full per-row sort, which measured ~2.8 s per pyramid on
    v5e at [26624, 26624].  recall_target 0.95 keeps the bucket-reduction
    output small (~1k candidates vs 6656 at 0.99, whose final exact sort
    was the dominant pyramid cost — ~0.95 s/run, traced); ~0.95
    per-neighbor recall is on par with the reference's own calibrated
    neighbor truncation (datasets/dataloader.py:402-434).  On CPU this
    lowers to an exact top-k.  ``exact=True`` forces ``lax.top_k`` — with
    tile-pruned candidate sets (~3k wide) the exact sort is affordable.
    """
    # k == 1 is ALWAYS exact: top_k(1) compiles to an argmax (no sort),
    # while approx_max_k at k=1 misses the true nearest on ~(1-recall)
    # of rows — fatal for nearest-upsample/closest-pool, whose semantics
    # depend on the FIRST neighbor (reference models/blocks.py:71-83;
    # the round-1 dense+approx variant broke exactly this way, PERF.md).
    if exact or k == 1:
        neg, idx = jax.lax.top_k(-d2, k)
    else:
        neg, idx = jax.lax.approx_max_k(-d2, k, recall_target=recall_target)
    return -neg, idx


def _pad_rows(x: jnp.ndarray, multiple: int, fill) -> jnp.ndarray:
    n = x.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return x
    pad_widths = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad_widths, constant_values=fill)


def radius_search(
    queries: jnp.ndarray,
    supports: jnp.ndarray,
    support_mask: jnp.ndarray,
    radius: float,
    k: int,
    query_chunk: int = 1024,
) -> jnp.ndarray:
    """queries [Nq,3], supports [Ns,3], support_mask [Ns] -> idx [Nq,k] int32.

    idx values in [0, Ns]; Ns is the pad/shadow index.  Neighbors are sorted
    by ascending distance.  Pad queries (sitting at PAD_COORD) naturally get
    all-shadow rows because every real support is out of radius.
    """
    nq = queries.shape[0]
    ns = supports.shape[0]
    chunk = min(query_chunk, nq)

    sup_sq = jnp.sum(supports * supports, axis=-1)  # [Ns]
    sup_sq = jnp.where(support_mask, sup_sq, jnp.inf)
    sup_t = supports.T  # [3, Ns]
    r2 = jnp.float32(radius) ** 2

    def one_chunk(q):  # q: [chunk, 3]
        d2 = _sq_dists(q, sup_t, sup_sq)
        d2k, idx = _smallest_k(d2, k)  # ascending distance
        idx = jnp.where(d2k <= r2, idx, ns)
        return idx.astype(jnp.int32)

    padded = _pad_rows(queries, chunk, PAD_COORD)
    out = jax.lax.map(one_chunk, padded.reshape(-1, chunk, 3))
    return out.reshape(-1, k)[:nq]


def knn_search(
    queries: jnp.ndarray,
    supports: jnp.ndarray,
    support_mask: jnp.ndarray,
    k: int,
    query_chunk: int = 1024,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest (valid) supports per query, ascending; returns (idx [Nq,k]
    int32 clipped to valid entries — pad = Ns — and squared distances)."""
    nq = queries.shape[0]
    ns = supports.shape[0]
    chunk = min(query_chunk, nq)

    sup_sq = jnp.sum(supports * supports, axis=-1)
    sup_sq = jnp.where(support_mask, sup_sq, jnp.inf)
    sup_t = supports.T

    def one_chunk(q):
        d2 = _sq_dists(q, sup_t, sup_sq)
        d2k, idx = _smallest_k(d2, k)
        idx = jnp.where(jnp.isfinite(d2k), idx, ns)
        return idx.astype(jnp.int32), d2k

    padded = _pad_rows(queries, chunk, PAD_COORD)
    idx, d2 = jax.lax.map(one_chunk, padded.reshape(-1, chunk, 3))
    return idx.reshape(-1, k)[:nq], d2.reshape(-1, k)[:nq]


def min_dist_sq(
    queries: jnp.ndarray,
    supports: jnp.ndarray,
    support_mask: jnp.ndarray,
    query_chunk: int = 2048,
) -> jnp.ndarray:
    """Per-query squared distance to the nearest valid support [Nq]."""
    nq = queries.shape[0]
    chunk = min(query_chunk, nq)
    sup_sq = jnp.sum(supports * supports, axis=-1)
    sup_sq = jnp.where(support_mask, sup_sq, jnp.inf)
    sup_t = supports.T

    def one_chunk(q):
        return jnp.min(_sq_dists(q, sup_t, sup_sq), axis=-1)

    padded = _pad_rows(queries, chunk, PAD_COORD)
    out = jax.lax.map(one_chunk, padded.reshape(-1, chunk, 3))
    return out.reshape(-1)[:nq]
