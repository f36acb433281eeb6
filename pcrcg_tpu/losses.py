"""Training losses: circle loss + weighted-BCE overlap/saliency (+ optional
node-overlap BCE and pose MSE).

Capability parity with reference lib/loss.py:46-252 and the trainer's
actual (unweighted) summation (lib/trainer.py:255-261).  Faithfully kept
quirks:
* ``MetricLoss(config)`` is constructed positionally, so log_scale stays at
  the DEFAULT 16 (config's log_scale: 24 is dead), pos_optimal=0.1,
  neg_optimal=1.4 (lib/loss.py:50, main.py:100);
* correspondences are re-filtered at pos_radius − 0.001 then subsampled to
  max_points (loss.py:228-233);
* the circle-loss logsumexp runs over ALL real candidate entries — masked
  (zero-weight) real entries contribute exp(0)=1 (loss.py:92-95);
* BCE class weights: positives weighted by the NEGATIVE fraction and vice
  versa (loss.py:117-128).

TPU-native redesign: ground-truth correspondences are computed ON DEVICE
from the GT transform (replacing the per-pair CPU Open3D radius search at
lib/benchmark_utils.py:121-135): overlap membership via chunked min-distance
and circle-loss pairs via the shared fixed-capacity radius search.
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from pcrcg_tpu.config import Config
from pcrcg_tpu.geom import se3
from pcrcg_tpu.ops.masked import masked_logsumexp, pad_gather
from pcrcg_tpu.ops.matching import nearest_feature_neighbor
from pcrcg_tpu.ops.neighbors import min_dist_sq, radius_search
from pcrcg_tpu.ops.tiled_search import min_dist_sq_tiled, radius_search_tiled

_HIGH = jax.lax.Precision.HIGHEST


class LossInputs(NamedTuple):
    src_pcd: jnp.ndarray  # [N,3] raw (augmented) source points, padded
    tgt_pcd: jnp.ndarray  # [M,3]
    src_mask: jnp.ndarray  # [N] bool
    tgt_mask: jnp.ndarray  # [M]
    rot: jnp.ndarray  # [3,3] GT rotation src->tgt
    trans: jnp.ndarray  # [3] or [3,1]
    src_feats: jnp.ndarray  # [N,C] L2-normalized descriptors
    tgt_feats: jnp.ndarray  # [M,C]
    scores_overlap: jnp.ndarray  # [N+M] stacked (src then tgt)
    scores_saliency: jnp.ndarray  # [N+M]


def weighted_bce(prediction, gt, valid) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Class-weighted BCE over valid entries + precision/recall
    (reference loss.py:117-135).  prediction/gt/valid: [K]."""
    v = valid.astype(prediction.dtype)
    n = jnp.maximum(jnp.sum(v), 1.0)
    # Clamp away exact 0/1 before the logs: bounds the backward at ~1e7
    # (torch BCE clamps log at -100 for the same reason); saturated sigmoid
    # outputs otherwise produce 1e12-scale cotangents that can overflow
    # downstream f32 accumulations.
    p = jnp.clip(prediction, 1e-7, 1.0 - 1e-7)
    ce = -(gt * jnp.log(p) + (1.0 - gt) * jnp.log(1.0 - p))
    w_negative = jnp.sum(gt * v) / n  # positive fraction, applied to negatives
    w_positive = 1.0 - w_negative
    weights = jnp.where(gt >= 0.5, w_positive, w_negative)
    loss = jnp.sum(weights * ce * v) / n

    pred_label = (prediction >= 0.5) & (valid > 0)
    gt_label = (gt >= 0.5) & (valid > 0)
    tp = jnp.sum((pred_label & gt_label).astype(jnp.float32))
    precision = tp / jnp.maximum(jnp.sum(pred_label.astype(jnp.float32)), 1.0)
    recall = tp / jnp.maximum(jnp.sum(gt_label.astype(jnp.float32)), 1.0)
    return loss, precision, recall


def circle_loss_and_recall(
    coords_dist, feats_dist, pair_valid, cfg: Config,
    log_scale=16.0, pos_optimal=0.1, neg_optimal=1.4,
):
    """coords_dist/feats_dist [P,P] over sampled correspondence points,
    pair_valid [P] (reference loss.py:71-115)."""
    valid2d = pair_valid[:, None] & pair_valid[None, :]
    # Invalid entries: neither positive nor negative, excluded from lse.
    mid = 0.5 * (cfg.pos_radius + cfg.safe_radius)
    coords_dist = jnp.where(valid2d, coords_dist, mid)

    pos_mask = coords_dist < cfg.pos_radius
    neg_mask = coords_dist > cfg.safe_radius

    row_sel = (jnp.sum(pos_mask, -1) > 0) & (jnp.sum(neg_mask, -1) > 0) & pair_valid
    col_sel = (jnp.sum(pos_mask, -2) > 0) & (jnp.sum(neg_mask, -2) > 0) & pair_valid

    pos_weight = feats_dist - 1e5 * (~pos_mask).astype(feats_dist.dtype)
    pos_weight = jax.lax.stop_gradient(jnp.maximum(pos_weight - pos_optimal, 0.0))
    neg_weight = feats_dist + 1e5 * (~neg_mask).astype(feats_dist.dtype)
    neg_weight = jax.lax.stop_gradient(jnp.maximum(neg_optimal - neg_weight, 0.0))

    pos_term = log_scale * (feats_dist - cfg.pos_margin) * pos_weight
    neg_term = log_scale * (cfg.neg_margin - feats_dist) * neg_weight

    lse_pos_row = masked_logsumexp(pos_term, valid2d, axis=-1)
    lse_pos_col = masked_logsumexp(pos_term, valid2d, axis=-2)
    lse_neg_row = masked_logsumexp(neg_term, valid2d, axis=-1)
    lse_neg_col = masked_logsumexp(neg_term, valid2d, axis=-2)

    loss_row = jax.nn.softplus(lse_pos_row + lse_neg_row) / log_scale
    loss_col = jax.nn.softplus(lse_pos_col + lse_neg_col) / log_scale

    def sel_mean(x, sel):
        s = sel.astype(x.dtype)
        return jnp.sum(x * s) / jnp.maximum(jnp.sum(s), 1.0)

    circle = (sel_mean(loss_row, row_sel) + sel_mean(loss_col, col_sel)) / 2.0

    # Feature-match recall (loss.py:104-115): among anchors with a GT
    # positive, fraction whose nearest-feature match is within pos_radius.
    has_pos = jnp.sum(pos_mask, -1) > 0
    neg = jnp.finfo(feats_dist.dtype).max
    fd = jnp.where(valid2d, feats_dist, neg)
    sel_idx = jnp.argmin(fd, axis=-1)
    sel_dist = jnp.take_along_axis(coords_dist, sel_idx[:, None], axis=-1)[:, 0]
    n_pred = jnp.sum(((sel_dist < cfg.pos_radius) & has_pos).astype(jnp.float32))
    n_gt = jnp.sum(has_pos.astype(jnp.float32)) + 1e-12
    return circle, n_pred / n_gt


def metric_loss(
    inputs: LossInputs,
    cfg: Config,
    key: jax.Array,
    extras: Dict[str, jnp.ndarray] | None = None,
) -> Dict[str, jnp.ndarray]:
    """Returns the reference's stats dict plus ``total`` = unweighted
    circle + overlap + saliency (+ node_overlap, pose) sum — the trainer's
    actual behavior (lib/trainer.py:255-261)."""
    n, m = inputs.src_pcd.shape[0], inputs.tgt_pcd.shape[0]
    trans = inputs.trans.reshape(3)
    g = se3.from_rt(inputs.rot, trans)
    src_warp = se3.transform(g, inputs.src_pcd)
    src_warp = jnp.where(inputs.src_mask[:, None], src_warp, inputs.src_pcd)

    stats: Dict[str, jnp.ndarray] = {}

    # --- overlap BCE: membership = has a counterpart within overlap_radius.
    # Tile-pruned geometric searches (ops/tiled_search.py): the warped src
    # keeps its Z-order locality (rigid transforms preserve it), and the
    # min-distance is only ever compared against a small radius, which the
    # pruned minimum preserves exactly.
    r2 = jnp.float32(cfg.overlap_radius) ** 2
    b = cfg.budgets
    chunk = b.query_chunk
    if b.search_impl == "tiled":
        def _min_d2(q, s, m):
            return min_dist_sq_tiled(q, s, m, b.search_tile, b.search_m_tiles, chunk)
    else:
        def _min_d2(q, s, m):
            return min_dist_sq(q, s, m, chunk)
    src_over = (_min_d2(src_warp, inputs.tgt_pcd, inputs.tgt_mask) <= r2) & inputs.src_mask
    tgt_over = (_min_d2(inputs.tgt_pcd, src_warp, inputs.src_mask) <= r2) & inputs.tgt_mask
    gt_labels = jnp.concatenate([src_over, tgt_over]).astype(jnp.float32)
    valid = jnp.concatenate([inputs.src_mask, inputs.tgt_mask])
    overlap_loss, overlap_prec, overlap_rec = weighted_bce(
        inputs.scores_overlap, gt_labels, valid
    )
    stats["overlap_loss"] = overlap_loss
    stats["overlap_precision"] = overlap_prec
    stats["overlap_recall"] = overlap_rec

    # --- saliency BCE: only points inside the overlap region are
    # supervised; label = nearest-feature counterpart (within the overlap
    # sets) lies within matchability_radius (loss.py:206-224).
    idx1 = nearest_feature_neighbor(inputs.src_feats, inputs.tgt_feats, tgt_over, chunk)
    d1 = jnp.linalg.norm(src_warp - pad_gather(inputs.tgt_pcd, idx1, 0.0), axis=-1)
    idx2 = nearest_feature_neighbor(inputs.tgt_feats, inputs.src_feats, src_over, chunk)
    d2 = jnp.linalg.norm(inputs.tgt_pcd - pad_gather(src_warp, idx2, 0.0), axis=-1)
    sal_gt = jnp.concatenate([d1 < cfg.matchability_radius, d2 < cfg.matchability_radius])
    sal_valid = jnp.concatenate([src_over, tgt_over])
    saliency_loss, sal_prec, sal_rec = weighted_bce(
        inputs.scores_saliency, sal_gt.astype(jnp.float32), sal_valid
    )
    stats["saliency_loss"] = saliency_loss
    stats["saliency_precision"] = sal_prec
    stats["saliency_recall"] = sal_rec

    # --- circle loss on ≤ max_points sampled correspondences.  Candidates
    # via on-device radius search at overlap_radius (the dataset's GT-corr
    # convention), re-filtered at pos_radius − 0.001 (loss.py:228-233).
    k = cfg.budgets.corr_k
    if b.search_impl == "tiled":
        cand = radius_search_tiled(
            src_warp, inputs.tgt_pcd, inputs.tgt_mask, cfg.overlap_radius, k,
            b.search_tile, b.search_m_tiles, chunk, exact=b.search_exact,
        )
    else:
        cand = radius_search(src_warp, inputs.tgt_pcd, inputs.tgt_mask, cfg.overlap_radius, k, chunk)
    cand_valid = (cand < m) & inputs.src_mask[:, None]
    cand_tgt = jnp.minimum(cand, m - 1)
    cand_dist = jnp.linalg.norm(
        src_warp[:, None, :] - inputs.tgt_pcd[cand_tgt], axis=-1
    )
    cand_valid &= cand_dist < (cfg.pos_radius - 0.001)

    # Uniform sample of max_points among valid candidates (loss.py:231-233).
    score = jnp.where(
        cand_valid.reshape(-1), jax.random.uniform(key, (n * k,)), -jnp.inf
    )
    _, take = jax.lax.top_k(score, cfg.max_points)
    pair_valid = cand_valid.reshape(-1)[take]
    src_idx = (take // k).astype(jnp.int32)
    tgt_idx = cand_tgt.reshape(-1)[take]

    s_pts = src_warp[src_idx]
    t_pts = inputs.tgt_pcd[tgt_idx]
    s_f = inputs.src_feats[src_idx]
    t_f = inputs.tgt_feats[tgt_idx]

    coords_dist = jnp.sqrt(
        jnp.maximum(
            jnp.sum(s_pts**2, -1)[:, None]
            + jnp.sum(t_pts**2, -1)[None, :]
            - 2.0 * jnp.matmul(s_pts, t_pts.T, precision=_HIGH),
            1e-12,
        )
    )
    # Features are L2-normalized: d² = 2 − 2·cos (loss.py square_distance
    # normalised=True, clamped at 1e-12).
    feats_dist = jnp.sqrt(
        jnp.maximum(2.0 - 2.0 * jnp.matmul(s_f, t_f.T, precision=_HIGH), 1e-12)
    )
    circle, recall = circle_loss_and_recall(coords_dist, feats_dist, pair_valid, cfg)
    stats["circle_loss"] = circle
    stats["recall"] = recall

    total = circle + overlap_loss + saliency_loss

    if extras:
        if "node_overlap_score_pred" in extras:
            # Super-node overlap GT (reference datasets/dataloader.py:107-198
            # point2node_correspondences): each fine point is assigned to its
            # nearest bottleneck node; a node's label is the fraction of its
            # points inside the overlap region — computed on device here
            # instead of in CPU collation.
            from pcrcg_tpu.ops.neighbors import knn_search

            nodes = extras["nodes"]  # [2,Nc,3]
            node_masks = extras["node_masks"]  # [2,Nc]
            nc = nodes.shape[1]

            def node_vis(points, mask, over, node_pts, node_mask):
                idx, _ = knn_search(points, node_pts, node_mask, 1, chunk)
                idx = jnp.minimum(idx[:, 0], nc - 1)
                idx = jnp.where(mask, idx, nc)  # drop pad points
                tot = jnp.zeros((nc,)).at[idx].add(1.0, mode="drop")
                vis = jnp.zeros((nc,)).at[idx].add(over.astype(jnp.float32), mode="drop")
                return vis / jnp.maximum(tot, 1.0)

            gt_nodes = jnp.concatenate(
                [
                    node_vis(src_warp, inputs.src_mask, src_over, nodes[0], node_masks[0]),
                    node_vis(inputs.tgt_pcd, inputs.tgt_mask, tgt_over, nodes[1], node_masks[1]),
                ]
            )
            node_valid = jnp.concatenate([node_masks[0], node_masks[1]])
            no_loss, no_prec, no_rec = weighted_bce(
                extras["node_overlap_score_pred"].reshape(-1), gt_nodes, node_valid
            )
            stats["node_overlap_loss"] = no_loss
            stats["node_overlap_precision"] = no_prec
            stats["node_overlap_recall"] = no_rec
            total = total + no_loss
        if "quaternion_pred" in extras:
            pose_loss = jnp.sum((extras["quaternion_pred"] - extras["quaternion_gt"]) ** 2)
            pose_loss += jnp.sum((extras["trans_pred"] - trans) ** 2)
            stats["pose_loss"] = pose_loss
            total = total + pose_loss

    stats["total"] = total
    return stats
