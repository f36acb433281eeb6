"""Descriptor-quality metrics: inlier ratios (with/without mutual check)
and feature-match-recall sweeps.

Capability parity with reference lib/benchmark_utils.py:226-311
(get_inlier_ratio, mutual_selection) and the FMR-vs-threshold sweeps the
run_ransac flow reports — on device, chunked, static shapes.
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from pcrcg_tpu.geom import se3
from pcrcg_tpu.ops.matching import nearest_feature_neighbor
from pcrcg_tpu.ops.masked import pad_gather


def inlier_ratio(
    src_pcd, tgt_pcd, src_feats, tgt_feats, rot, trans,
    src_mask, tgt_mask,
    inlier_distance_threshold: float = 0.1,
    chunk: int = 2048,
) -> Dict[str, jnp.ndarray]:
    """Inlier ratios with/without mutual check.  Pads excluded via masks."""
    g = se3.from_rt(rot, jnp.reshape(trans, (3,)))
    src_warp = se3.transform(g, src_pcd)

    idx_st = nearest_feature_neighbor(src_feats, tgt_feats, tgt_mask, chunk)
    d_wo = jnp.linalg.norm(src_warp - pad_gather(tgt_pcd, idx_st, 0.0), axis=-1)
    n_src = jnp.maximum(jnp.sum(src_mask), 1.0)
    wo = jnp.sum(((d_wo < inlier_distance_threshold) & src_mask)) / n_src

    # Mutual check: src i kept iff argmax_tgt(i)'s argmax_src == i.
    idx_ts = nearest_feature_neighbor(tgt_feats, src_feats, src_mask, chunk)
    mutual = (idx_ts[idx_st] == jnp.arange(src_pcd.shape[0])) & src_mask
    n_mut = jnp.maximum(jnp.sum(mutual), 1.0)
    w = jnp.sum((d_wo < inlier_distance_threshold) & mutual) / n_mut
    return {
        "inlier_ratio_wo_mutual": wo,
        "inlier_ratio_w_mutual": w,
        "distance_wo_mutual": d_wo,
        "mutual_mask": mutual,
    }


def feature_match_recall_sweep(
    distances: jnp.ndarray,
    valid: jnp.ndarray,
    thresholds: Sequence[float] = (0.05, 0.1, 0.2),
    inlier_ratio_threshold: float = 0.05,
):
    """Given per-anchor nearest-match distances (one pair), the pair's
    FMR contribution at each distance threshold: whether the inlier ratio
    clears inlier_ratio_threshold (the FMR protocol)."""
    n = jnp.maximum(jnp.sum(valid), 1.0)
    out = []
    for thr in thresholds:
        ratio = jnp.sum((distances < thr) & valid) / n
        out.append(ratio > inlier_ratio_threshold)
    return jnp.stack(out)


def mutual_selection(score_mat: jnp.ndarray) -> jnp.ndarray:
    """{0,1} matrix: 1 iff the entry is the max along BOTH its row and its
    column (reference benchmark_utils.py:270-295), vectorized."""
    if score_mat.ndim == 2:
        score_mat = score_mat[None]
    row_max = jnp.argmax(score_mat, axis=2)  # [B,N]
    col_max = jnp.argmax(score_mat, axis=1)  # [B,M]
    n, m = score_mat.shape[1], score_mat.shape[2]
    flag_row = jax.nn.one_hot(row_max, m, dtype=bool)  # [B,N,M]
    flag_col = jax.nn.one_hot(col_max, n, dtype=bool).swapaxes(1, 2)  # [B,N,M]
    return flag_row & flag_col
