"""Batched on-device RANSAC for rigid registration.

Capability parity with Open3D ``registration_ransac_based_on_feature_
matching`` as invoked by the reference (lib/benchmark_utils.py:187-224:
50k iterations / ransac_n 3-or-4 / edge-length 0.9 + distance checkers,
TransformationEstimationPointToPoint without scaling), re-designed for the
TPU: instead of a sequential loop with early exit, ALL hypotheses are
generated up front from PRNG keys, fitted with a vmapped Procrustes, gated
by vectorized checkers, and scored by chunked inlier counting — thousands
of hypotheses per MXU pass, deterministic given the key.

Correspondences come from nearest-neighbor feature matching (optionally
mutual — reference ``mutual_selection``, benchmark_utils.py:285-311).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pcrcg_tpu.ops.matching import nearest_feature_neighbor
from pcrcg_tpu.registration.procrustes import rigid_transform_3pt, rigid_transform_horn

_HIGH = jax.lax.Precision.HIGHEST


class RansacResult(NamedTuple):
    transform: jnp.ndarray  # [3,4] best rigid transform src->tgt
    fitness: jnp.ndarray  # inlier fraction of the correspondence set
    inlier_rmse: jnp.ndarray


def feature_correspondences(
    src_feats, tgt_feats, src_mask, tgt_mask, mutual: bool = False, chunk: int = 2048
):
    """Nearest-neighbor matches src->tgt in feature space.

    Returns (corr_tgt_idx [N] int32, corr_valid [N] bool).  With
    ``mutual=True`` only cycle-consistent matches stay valid (reference
    mutual_selection, lib/benchmark_utils.py:285-311).
    """
    idx_st = nearest_feature_neighbor(src_feats, tgt_feats, tgt_mask, chunk)
    valid = src_mask
    if mutual:
        idx_ts = nearest_feature_neighbor(tgt_feats, src_feats, src_mask, chunk)
        back = idx_ts[idx_st]
        valid = valid & (back == jnp.arange(src_feats.shape[0], dtype=jnp.int32))
    return idx_st, valid


def ransac_pose(
    key: jax.Array,
    src_pcd: jnp.ndarray,
    tgt_pcd: jnp.ndarray,
    corr_tgt_idx: jnp.ndarray,
    corr_valid: jnp.ndarray,
    distance_threshold: float = 0.05,
    ransac_n: int = 3,
    num_iterations: int = 50000,
    edge_similarity: float = 0.9,
    hypothesis_chunk: int = 512,
    refine: bool = True,
) -> RansacResult:
    """src_pcd [N,3] with correspondence tgt_pcd[corr_tgt_idx] [N,3].

    Every iteration draws ``ransac_n`` correspondence rows, applies the
    edge-length and post-fit distance checkers (Open3D parameter parity),
    fits Procrustes, and counts inliers over the full correspondence set.
    ``refine=True`` adds one least-squares refit on the best hypothesis's
    inliers (cheap accuracy win the reference leaves to offline ICP).
    """
    n = src_pcd.shape[0]
    corr_src = src_pcd
    corr_tgt = tgt_pcd[jnp.minimum(corr_tgt_idx, tgt_pcd.shape[0] - 1)]
    valid_f = corr_valid.astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(valid_f), 1.0)
    thr2 = jnp.float32(distance_threshold) ** 2

    # Sample indices among valid correspondences: per-hypothesis Gumbel
    # top-ransac_n over the valid rows (uniform without replacement).
    def count_inliers(T):  # T [3,4] -> (inliers, sq_err_sum)
        moved = corr_src @ T[:, :3].T + T[:, 3]
        d2 = jnp.sum((moved - corr_tgt) ** 2, axis=-1)
        ok = (d2 <= thr2) & corr_valid
        return jnp.sum(ok.astype(jnp.float32)), jnp.sum(jnp.where(ok, d2, 0.0))

    def one_chunk(chunk_key):
        ks = jax.random.split(chunk_key, hypothesis_chunk)

        def one_hyp(k):
            g = jax.random.gumbel(k, (n,))
            g = jnp.where(corr_valid, g, -jnp.inf)
            _, pick = jax.lax.top_k(g, ransac_n)
            s = corr_src[pick]  # [r,3]
            t = corr_tgt[pick]
            # Edge-length checker (both directions, similarity 0.9).
            es = jnp.linalg.norm(s[:, None] - s[None, :], axis=-1)
            et = jnp.linalg.norm(t[:, None] - t[None, :], axis=-1)
            off = ~jnp.eye(ransac_n, dtype=bool)
            edge_ok = jnp.all(
                ((es > edge_similarity * et) & (et > edge_similarity * es)) | ~off
            )
            # Exact 3-point frame fit: no eigensolve inside the hot vmap
            # (the weighted fits stay for the refit pass).
            T = rigid_transform_3pt(s, t)
            # Distance checker on the sampled pairs post-fit.
            moved = s @ T[:, :3].T + T[:, 3]
            dist_ok = jnp.all(jnp.sum((moved - t) ** 2, -1) <= thr2)
            inl, err = count_inliers(T)
            score = jnp.where(edge_ok & dist_ok, inl, -1.0)
            return T, score, err

        return jax.vmap(one_hyp)(ks)

    n_chunks = max(num_iterations // hypothesis_chunk, 1)
    chunk_keys = jax.random.split(key, n_chunks)
    Ts, scores, errs = jax.lax.map(one_chunk, chunk_keys)
    Ts = Ts.reshape(-1, 3, 4)
    scores = scores.reshape(-1)
    errs = errs.reshape(-1)
    best = jnp.argmax(scores)
    best_T = Ts[best]
    best_inl = jnp.maximum(scores[best], 0.0)

    if refine:
        moved = corr_src @ best_T[:, :3].T + best_T[:, 3]
        d2 = jnp.sum((moved - corr_tgt) ** 2, axis=-1)
        w = ((d2 <= thr2) & corr_valid).astype(jnp.float32)
        # Guard: with < 3 inliers keep the raw hypothesis.
        refit = rigid_transform_horn(corr_src, corr_tgt, w)
        best_T = jnp.where(jnp.sum(w) >= 3, refit, best_T)
        moved = corr_src @ best_T[:, :3].T + best_T[:, 3]
        d2 = jnp.sum((moved - corr_tgt) ** 2, axis=-1)
        ok = (d2 <= thr2) & corr_valid
        best_inl = jnp.sum(ok.astype(jnp.float32))
        err = jnp.sum(jnp.where(ok, d2, 0.0))
    else:
        err = errs[best]

    fitness = best_inl / n_valid
    rmse = jnp.sqrt(err / jnp.maximum(best_inl, 1.0))
    return RansacResult(best_T, fitness, rmse)


def to_homogeneous(T: jnp.ndarray) -> jnp.ndarray:
    """[...,3,4] -> [...,4,4]."""
    bottom = jnp.zeros(T.shape[:-2] + (1, 4), T.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([T, bottom], axis=-2)
