"""On-device multi-scale pyramid builder.

Replaces the reference's per-sample CPU collation (datasets/
dataloader.py:203-400): per level ℓ it computes conv neighbors at radius
r_ℓ, strided-pool points via grid subsampling at dl = 2·r_ℓ/conv_radius,
pool neighbors at r_ℓ, and upsample neighbors at 2·r_ℓ, with r doubling
per level (dataloader.py:239,286-301,357).  Runs fully on device with
static shapes: each level holds both clouds on a leading [2, ...] axis
(src=0, tgt=1) instead of the reference's stacked-rows + lengths trick.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax.struct import dataclass as pytree

from pcrcg_tpu.config import Budgets
from pcrcg_tpu.ops.neighbors import radius_search
from pcrcg_tpu.ops.subsample import grid_subsample
from pcrcg_tpu.ops.tiled_search import radius_search_tiled


@pytree
class Pyramid:
    """Static-shape pyramid for one pair of clouds.

    points[ℓ]:    [2, N_ℓ, 3]   (pad rows at PAD_COORD)
    masks[ℓ]:     [2, N_ℓ]      bool
    neighbors[ℓ]: [2, N_ℓ, H_ℓ] conv neighbors within level ℓ (pad = N_ℓ)
    pools[ℓ]:     [2, N_{ℓ+1}, H_ℓ] neighbors of level-ℓ+1 queries in level ℓ
    upsamples[ℓ]: [2, N_ℓ, 1] nearest level-ℓ+1 point per level-ℓ query
                  (nearest-upsample reads only the closest neighbor)
    """

    points: Tuple[jnp.ndarray, ...]
    masks: Tuple[jnp.ndarray, ...]
    neighbors: Tuple[jnp.ndarray, ...]
    pools: Tuple[jnp.ndarray, ...]
    upsamples: Tuple[jnp.ndarray, ...]
    # Tile-local neighbor metadata for the candidate-DMA KPConv kernel
    # (ops/kpconv_tiled.py): per level, (lidx [2, Gp·128, H], tiles
    # [2, Gp, M]) or None when the level fell back to the dense search.
    conv_local: Tuple = ()
    pool_local: Tuple = ()


def build_pyramid(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    budgets: Budgets,
    first_subsampling_dl: float,
    conv_radius: float,
    with_overflow: bool = False,
    deform_conv: Tuple[bool, ...] | None = None,
    deform_pool: Tuple[bool, ...] | None = None,
    deform_scale: float = 2.0,
) -> Pyramid:
    """points [2, N_0, 3], mask [2, N_0] -> Pyramid (all levels).

    Geometry is index bookkeeping, not part of the differentiable graph —
    the caller should treat the result as constants (we stop gradients).

    ``deform_conv[ℓ]`` / ``deform_pool[ℓ]`` widen the level-ℓ conv / pool
    search radius by ``deform_scale`` (= deform_radius/conv_radius) for
    architectures with deformable blocks, replicating the reference
    collation (datasets/dataloader.py:266-299); get them from
    ``Config.deform_level_flags()``.  The subsampling grid and upsample
    radius always use the un-widened radius, as in the reference.

    With ``with_overflow`` also returns ``overflow`` [num_levels-1, 2] int32:
    per strided level and cloud, #occupied voxels MINUS the level budget —
    any positive entry means voxels were silently dropped (the reference's
    C++ ``max_p`` cap drops the tail the same way, grid_subsampling.cpp:
    109-211, but there the budgets were per-sample exact).  Debug/calibration
    path; Trainer checks budgets via data.calibrate.occupancy_report instead.
    """
    points = jax.lax.stop_gradient(points)
    num_levels = budgets.num_levels
    chunk = budgets.query_chunk

    if budgets.search_impl == "tiled":
        # The candidate-DMA distance kernel (ops/search_kernel.py) replaces
        # the lax.map-over-chunks XLA path on TPU: one Pallas dispatch for
        # both clouds, zero candidate row gathers.
        use_kernel = budgets.search_kernel and jax.default_backend() == "tpu"

        # m_tiles may be per-level (budgets.m_tiles_at); the searches at
        # level ℓ (conv, pool — supports live at level ℓ) use m_tiles[ℓ].
        def make_search(level, mt=None):
            mt = budgets.m_tiles_at(level) if mt is None else mt
            rt = budgets.recall_target_at(level)

            if use_kernel:
                from pcrcg_tpu.ops.tiled_search import radius_search_tiled_batch

                def search_batch(q, s, m, r, cap, ch):
                    return radius_search_tiled_batch(
                        q, s, m, r, cap,
                        tile=budgets.search_tile, m_tiles=mt,
                        exact=budgets.search_exact, recall_target=rt,
                    )

                def search_local_batch(q, s, m, r, cap, ch):
                    return radius_search_tiled_batch(
                        q, s, m, r, cap,
                        tile=budgets.search_tile, m_tiles=mt,
                        exact=budgets.search_exact, recall_target=rt,
                        return_local=True,
                    )

                return search_batch, search_local_batch

            def search_one(q, s, m, r, cap, ch):
                return radius_search_tiled(
                    q, s, m, r, cap,
                    tile=budgets.search_tile, m_tiles=mt,
                    query_chunk=ch, exact=budgets.search_exact,
                    recall_target=rt,
                )

            def search_local_one(q, s, m, r, cap, ch):
                return radius_search_tiled(
                    q, s, m, r, cap,
                    tile=budgets.search_tile, m_tiles=mt,
                    query_chunk=ch, exact=budgets.search_exact,
                    recall_target=rt,
                    return_local=True,
                )

            return (
                jax.vmap(search_one, in_axes=(0, 0, 0, None, None, None)),
                jax.vmap(search_local_one, in_axes=(0, 0, 0, None, None, None)),
            )

        per_level = [make_search(level) for level in range(num_levels)]
        search_at = lambda level: per_level[level][0]
        search_local_at = lambda level: per_level[level][1]
        # k=1 (upsample) searches keep only the 4 nearest candidate tiles:
        # the exact argmin over the full m_tiles*128 candidates was ~8 ms
        # of pyramid device time (round-5 trace), and the single nearest
        # support virtually always lives in the top-ranked tiles (box
        # distance ranks the container tile first barring degenerate
        # aspect ratios).  End-task validated like every search approx
        # (accuracy_evidence approx-vs-exact eval).
        per_level_k1 = [
            make_search(level, mt=min(4, budgets.m_tiles_at(level)))
            for level in range(num_levels)
        ]
        search_k1_at = lambda level: per_level_k1[level][0]
    else:
        dense = jax.vmap(radius_search, in_axes=(0, 0, 0, None, None, None))
        search_at = lambda level: dense
        search_k1_at = search_at
        search_local_at = None

    def subsample_one(p, m, dl, n):
        # order='morton': the subsample's own sort key doubles as the
        # Z-order the tile-pruned search wants — one argsort per level
        # instead of two (TPU sorts are expensive).
        tiled = budgets.search_impl == "tiled"
        pooled, pooled_mask, count = grid_subsample(
            p, m, dl, n, return_count=True,
            order="morton" if tiled else "raster",
        )
        if tiled:
            # Morton keys need <=1024 voxels per axis; past that the
            # subsample fell back to raster keys (long slabs), which
            # starves the tile pruning — recover the old unconditional
            # bbox Z-order in exactly that case.
            from pcrcg_tpu.ops.subsample import grid_fits_morton, morton_sort

            pooled, pooled_mask = jax.lax.cond(
                grid_fits_morton(p, m, dl),
                lambda pm: pm,
                lambda pm: morton_sort(pm[0], pm[1])[:2],
                (pooled, pooled_mask),
            )
        return pooled, pooled_mask, count

    subsample = jax.vmap(subsample_one, in_axes=(0, 0, None, None))

    r = first_subsampling_dl * conv_radius
    lvl_points = [points]
    lvl_masks = [mask]
    neighbors = []
    pools = []
    upsamples = []
    overflow = []

    conv_local = []
    pool_local = []
    for level in range(num_levels):
        cap = budgets.neighbors[level]
        pts, msk = lvl_points[level], lvl_masks[level]
        r_conv = r * deform_scale if (deform_conv and deform_conv[level]) else r
        if search_local_at is not None:
            idx, lidx, tls = search_local_at(level)(pts, pts, msk, r_conv, cap, chunk)
            neighbors.append(idx)
            conv_local.append(None if lidx is None else (lidx, tls))
        else:
            neighbors.append(search_at(level)(pts, pts, msk, r_conv, cap, chunk))
            conv_local.append(None)
        if level + 1 < num_levels:
            dl = 2.0 * r / conv_radius
            n_next = budgets.points[level + 1]
            pool_p, pool_m, n_voxels = subsample(pts, msk, dl, n_next)
            overflow.append(n_voxels - n_next)
            r_pool = r * deform_scale if (deform_pool and deform_pool[level]) else r
            if search_local_at is not None:
                pidx, plidx, ptls = search_local_at(level)(pool_p, pts, msk, r_pool, cap, chunk)
                pools.append(pidx)
                pool_local.append(None if plidx is None else (plidx, ptls))
            else:
                pools.append(search_at(level)(pool_p, pts, msk, r_pool, cap, chunk))
                pool_local.append(None)
            # Upsample lists are consumed ONLY by closest_pool / nearest
            # upsampling, which reads the single closest coarse point
            # (reference models/blocks.py:71-83 keeps just inds[:,0]); a k=1
            # search skips the per-row top-H selection entirely.  Supports
            # live at level+1, so that level's m_tiles applies.
            upsamples.append(
                search_k1_at(min(level + 1, num_levels - 1))(
                    pts, pool_p, pool_m, 2.0 * r, 1, chunk
                )
            )
            lvl_points.append(pool_p)
            lvl_masks.append(pool_m)
        r *= 2.0

    pyramid = Pyramid(
        points=tuple(lvl_points),
        masks=tuple(lvl_masks),
        neighbors=tuple(neighbors),
        pools=tuple(pools),
        upsamples=tuple(upsamples),
        conv_local=tuple(conv_local),
        pool_local=tuple(pool_local),
    )
    if with_overflow:
        return pyramid, jnp.stack(overflow)
    return pyramid


def build_pyramid_cfg(cfg, points: jnp.ndarray, mask: jnp.ndarray, **kw):
    """build_pyramid with every geometry knob taken from a Config —
    including the deformable-architecture radius widening.  Product call
    sites (train step, tester, CLI) should use this form."""
    deform_conv, deform_pool = cfg.deform_level_flags()
    if not any(deform_conv) and not any(deform_pool):
        deform_conv = deform_pool = None
    return build_pyramid(
        points, mask, cfg.budgets, cfg.first_subsampling_dl, cfg.conv_radius,
        deform_conv=deform_conv, deform_pool=deform_pool,
        deform_scale=cfg.deform_radius / cfg.conv_radius, **kw,
    )
