"""Pair containers: the static-shape unit of work.

A ``PairBatch`` holds B registration pairs, each as two fixed-budget padded
clouds on a [B, 2, N₀, ...] layout (src = index 0, tgt = 1).  This replaces
the reference's ragged src/tgt stacks + ``stack_lengths`` bookkeeping
(datasets/dataloader.py:221-236) and — because shapes are static — finally
allows batch > 1 and data-parallel sharding over a device mesh (the
reference hard-asserts batch_size == 1, dataloader.py:207).
"""
from __future__ import annotations

import warnings
from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax.struct import dataclass as pytree

from pcrcg_tpu.ops.masked import PAD_COORD


@pytree
class PairBatch:
    points: jnp.ndarray  # [B, 2, N0, 3] padded at PAD_COORD (model input)
    masks: jnp.ndarray  # [B, 2, N0] bool
    features: jnp.ndarray  # [B, 2, N0, Cin]
    rot: jnp.ndarray  # [B, 3, 3] GT rotation src->tgt
    trans: jnp.ndarray  # [B, 3]
    # Pre-augmentation clouds, same rows/order as ``points``; the loss uses
    # these when the augmentation is NOT folded into (rot, trans) — the
    # KITTI protocol (reference datasets/kitti.py:17-19).  None -> points.
    raw_points: Optional[jnp.ndarray] = None
    # Per-sample passthrough arrays stacked on the batch axis (e.g. the
    # ModelNet clean full cloud 'points_raw' the modified-chamfer metric
    # needs, reference lib/tester.py:280-286).  None when absent.
    extras: Optional[dict] = None

    @property
    def batch_size(self) -> int:
        return self.points.shape[0]

    @property
    def loss_points(self) -> jnp.ndarray:
        return self.points if self.raw_points is None else self.raw_points


def subsample_to_budget(
    n: int, budget: int, rng: Optional[np.random.Generator] = None
) -> Optional[np.ndarray]:
    """Row selection for an over-budget cloud: ``budget`` indices chosen
    uniformly at random (NOT a head slice — the reference caps fragments by
    random permutation, datasets/indoor.py:142-147, and a head slice would
    drop a spatially coherent chunk).  Returns None when no truncation is
    needed."""
    if n <= budget:
        return None
    warnings.warn(
        f"cloud with {n} points truncated to budget {budget} by uniform "
        "random subsampling; raise budgets.points[0] to keep all points",
        stacklevel=3,
    )
    rng = rng if rng is not None else np.random.default_rng(0)
    return rng.permutation(n)[:budget]


def pad_cloud(
    points: np.ndarray,
    budget: int,
    rng: Optional[np.random.Generator] = None,
    select: Optional[np.ndarray] = None,
) -> tuple[np.ndarray, np.ndarray]:
    """[n,3] -> ([budget,3] padded at PAD_COORD, [budget] mask).  Clouds over
    budget are subsampled uniformly at random (with a warning); pass
    ``select`` to reuse one cloud's row selection on a sibling array (e.g.
    the pre-augmentation raw cloud, which must stay row-aligned)."""
    if select is None:
        select = subsample_to_budget(points.shape[0], budget, rng)
    if select is not None:
        points = points[select]
    n = min(points.shape[0], budget)
    out = np.full((budget, 3), PAD_COORD, np.float32)
    out[:n] = points[:n]
    mask = np.zeros(budget, bool)
    mask[:n] = True
    return out, mask


def _np_morton_order(points: np.ndarray) -> np.ndarray:
    """Z-order sort permutation (1024³ grid over the bounding box) — host
    twin of ops.subsample.morton_code.  Spatially local row order makes the
    tile-pruned neighbor search (ops/tiled_search.py) effective at level 0."""
    vmin = points.min(0)
    extent = max(float((points.max(0) - vmin).max()), 1e-6)
    ijk = np.clip(((points - vmin) / extent * 1023.0).astype(np.int64), 0, 1023)

    def spread(v):
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    code = spread(ijk[:, 0]) | (spread(ijk[:, 1]) << 1) | (spread(ijk[:, 2]) << 2)
    return np.argsort(code, kind="stable")


def make_pair_batch(
    samples: list[dict],
    budget: int,
    in_feats_dim: int = 1,
    features: Optional[np.ndarray] = None,
    rng: Optional[np.random.Generator] = None,
    extra_keys: tuple = ("points_raw",),
) -> PairBatch:
    """samples: list of dicts with keys src_pcd [n,3], tgt_pcd [m,3],
    rot [3,3], trans [3] or [3,1].  Input feature = ones column on real rows
    (reference datasets/indoor.py:179-180); richer features (the 2D lift)
    overwrite via ``features`` [B,2,N,Cin].  Over-budget clouds are randomly
    subsampled (see pad_cloud); the raw clouds reuse the same selection so
    rows stay aligned."""
    bsz = len(samples)
    pts = np.full((bsz, 2, budget, 3), PAD_COORD, np.float32)
    msk = np.zeros((bsz, 2, budget), bool)
    rot = np.zeros((bsz, 3, 3), np.float32)
    trans = np.zeros((bsz, 3), np.float32)
    has_raw = "raw_src_pcd" in samples[0]
    raw = np.full((bsz, 2, budget, 3), PAD_COORD, np.float32) if has_raw else None
    for i, s in enumerate(samples):
        src = np.asarray(s["src_pcd"], np.float32)
        tgt = np.asarray(s["tgt_pcd"], np.float32)
        sel_src = subsample_to_budget(src.shape[0], budget, rng)
        sel_tgt = subsample_to_budget(tgt.shape[0], budget, rng)
        pts[i, 0], msk[i, 0] = pad_cloud(src, budget, select=sel_src)
        pts[i, 1], msk[i, 1] = pad_cloud(tgt, budget, select=sel_tgt)
        if has_raw:
            raw[i, 0], _ = pad_cloud(
                np.asarray(s["raw_src_pcd"], np.float32), budget, select=sel_src
            )
            raw[i, 1], _ = pad_cloud(
                np.asarray(s["raw_tgt_pcd"], np.float32), budget, select=sel_tgt
            )
        # Z-order each cloud's real rows (one permutation, applied to the
        # raw clouds too so rows stay aligned).  Order is semantically
        # neutral downstream; it exists for search-tile locality.
        for c in range(2):
            n = int(msk[i, c].sum())
            if n > 1:
                order = _np_morton_order(pts[i, c, :n])
                pts[i, c, :n] = pts[i, c, :n][order]
                if has_raw:
                    raw[i, c, :n] = raw[i, c, :n][order]
        rot[i] = np.asarray(s["rot"], np.float32).reshape(3, 3)
        trans[i] = np.asarray(s["trans"], np.float32).reshape(3)
    if features is None:
        feats = np.where(msk[..., None], 1.0, 0.0).astype(np.float32)
        feats = np.tile(feats, (1, 1, 1, in_feats_dim))
    else:
        feats = np.asarray(features, np.float32)
    extras = {
        k: jnp.asarray(np.stack([np.asarray(s[k], np.float32) for s in samples]))
        for k in extra_keys
        if k in samples[0]
    }
    return PairBatch(
        points=jnp.asarray(pts),
        masks=jnp.asarray(msk),
        features=jnp.asarray(feats),
        rot=jnp.asarray(rot),
        trans=jnp.asarray(trans),
        raw_points=jnp.asarray(raw) if has_raw else None,
        extras=extras or None,
    )
