"""Barycenter voxel-grid subsampling, on device, static output shape.

TPU-native replacement for the reference's CPU grid subsampling
(cpp_subsampling/grid_subsampling.cpp:5-106).  Semantics preserved:
* origin corner = floor(min_valid_point / dl) * dl (grid_subsampling.cpp
  ``originCorner``),
* each point hashes to voxel (iX, iY, iZ) = floor((p - origin)/dl),
* output = per-voxel barycenter of its points.

Instead of an unordered_map we sort points by a linearized voxel key and
segment-reduce; the output order is voxel-key order (spatially coherent —
good for locality) rather than hash-iteration order, which downstream ops
never depended on.  If distinct voxels exceed ``n_out`` the surplus voxels
are dropped (budgets must be calibrated generously; see Budgets).
"""
from __future__ import annotations

import jax.numpy as jnp

from pcrcg_tpu.ops.masked import PAD_COORD

_INT_MAX = jnp.iinfo(jnp.int32).max


def _spread_bits_10(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v so they occupy every 3rd bit (classic
    Morton bit-interleave helper)."""
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def morton_code(points: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Z-order (Morton) code per point on a 1024³ grid over the valid
    bounding box; invalid rows map to INT_MAX so they sort last.

    Used purely as a SPATIAL SORT KEY (tile locality for the pruned
    neighbor search) — never as a voxel identity."""
    big = jnp.float32(PAD_COORD)
    vmin = jnp.min(jnp.where(mask[:, None], points, big), axis=0)
    vmax = jnp.max(jnp.where(mask[:, None], points, -big), axis=0)
    extent = jnp.maximum(jnp.max(vmax - vmin), 1e-6)
    ijk = jnp.clip(
        ((points - vmin) / extent * 1023.0).astype(jnp.int32), 0, 1023
    )
    code = (
        _spread_bits_10(ijk[:, 0])
        | (_spread_bits_10(ijk[:, 1]) << 1)
        | (_spread_bits_10(ijk[:, 2]) << 2)
    )
    return jnp.where(mask, code, _INT_MAX)


def grid_fits_morton(points: jnp.ndarray, mask: jnp.ndarray, dl: float):
    """Whether grid_subsample(order='morton') can Z-order this input —
    i.e. the voxel grid fits 1024 cells per axis (same origin/dims
    formulas as grid_subsample).  Lets callers lax.cond a bbox
    morton_sort onto the raster fallback."""
    big = jnp.float32(PAD_COORD)
    pmin = jnp.min(jnp.where(mask[:, None], points, big), axis=0)
    pmax = jnp.max(jnp.where(mask[:, None], points, -big), axis=0)
    origin = jnp.floor(pmin / dl) * dl
    dims = jnp.floor((pmax - origin) / dl).astype(jnp.int32) + 1
    return jnp.all(dims <= 1024)


def morton_sort(points: jnp.ndarray, mask: jnp.ndarray):
    """Sort points spatially (Z-order); pads stay at the tail.  Returns
    (points, mask, order) — order maps sorted rows back to input rows."""
    order = jnp.argsort(morton_code(points, mask))
    return points[order], mask[order], order


def grid_subsample(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    dl: float,
    n_out: int,
    return_count: bool = False,
    order: str = "raster",
) -> tuple[jnp.ndarray, ...]:
    """points [N,3], mask [N] -> (pooled [n_out,3], pooled_mask [n_out]).

    Pad outputs sit at PAD_COORD.  With ``return_count`` a third output is
    the number of distinct occupied voxels — ``count > n_out`` means voxels
    were silently dropped (budget overflow) and the level is corrupt; the
    pyramid's debug path and Trainer's occupancy report check it.

    ``order``: the voxel linearization used as the sort key, which is also
    the OUTPUT row order.  Any injective key gives identical barycenters;
    'morton' emits the pooled level directly in Z-order (what the
    tile-pruned search wants), saving the separate morton_sort argsort —
    TPU sorts are expensive.  Falls back to raster keys when the voxel
    grid exceeds 1024³ (Morton bits per axis).
    """
    big = jnp.float32(PAD_COORD)
    valid_pts = jnp.where(mask[:, None], points, big)
    pmin = jnp.min(valid_pts, axis=0)
    pmax = jnp.max(jnp.where(mask[:, None], points, -big), axis=0)
    origin = jnp.floor(pmin / dl) * dl

    ijk = jnp.floor((points - origin) / dl).astype(jnp.int32)  # [N,3]
    dims = jnp.floor((pmax - origin) / dl).astype(jnp.int32) + 1  # [3]
    key = ijk[:, 0] + dims[0] * (ijk[:, 1] + dims[1] * ijk[:, 2])
    if order == "morton":
        ijk_c = jnp.clip(ijk, 0, 1023)
        mkey = (
            _spread_bits_10(ijk_c[:, 0])
            | (_spread_bits_10(ijk_c[:, 1]) << 1)
            | (_spread_bits_10(ijk_c[:, 2]) << 2)
        )
        key = jnp.where(jnp.all(dims <= 1024), mkey, key)
    elif order != "raster":
        raise ValueError(f"unknown order: {order}")
    key = jnp.where(mask, key, _INT_MAX)

    order = jnp.argsort(key)  # stable; invalid rows sort last
    sorted_key = key[order]
    sorted_pts = points[order]
    sorted_valid = mask[order]

    first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_key[1:] != sorted_key[:-1]]
    )
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1  # dense voxel rank
    n_voxels = jnp.max(jnp.where(sorted_valid, seg, -1)) + 1
    seg = jnp.where(sorted_valid, seg, n_out)  # drop pads via OOB scatter

    sums = jnp.zeros((n_out, 3), points.dtype).at[seg].add(sorted_pts, mode="drop")
    counts = jnp.zeros((n_out,), points.dtype).at[seg].add(1.0, mode="drop")
    out_mask = counts > 0
    pooled = sums / jnp.maximum(counts, 1.0)[:, None]
    pooled = jnp.where(out_mask[:, None], pooled, big)
    if return_count:
        return pooled, out_mask, n_voxels
    return pooled, out_mask
