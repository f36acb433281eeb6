"""Candidate-DMA search-distance kernel (ops/search_kernel.py) and the
batched tiled search built on it, vs the per-cloud XLA path (interpret
mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from pcrcg_tpu.ops.masked import PAD_COORD
from pcrcg_tpu.ops.neighbors import _pad_rows
from pcrcg_tpu.ops.search_kernel import (
    pack_supports_tile_major,
    tiled_candidate_distances,
)
from pcrcg_tpu.ops.subsample import morton_sort
from pcrcg_tpu.ops.tiled_search import (
    radius_search_tiled,
    radius_search_tiled_batch,
)


def _sorted_cloud(rng, n, scale=3.0):
    # 3DMatch-scale coordinates (metres): the kernel's limb-expanded cross
    # term has ABSOLUTE error in |q||c|, so unit-cube clouds would hide
    # precision problems that real scans expose.
    pts = rng.uniform(0, scale, size=(n, 3)).astype(np.float32)
    sorted_pts, mask, _ = morton_sort(jnp.asarray(pts), jnp.ones(n, bool))
    return sorted_pts, mask


def test_distance_kernel_matches_numpy(rng):
    tile = 32
    ns, nq, m = 512, 256, 4
    sup, smask = _sorted_cloud(rng, ns)
    # Invalidate a few supports to exercise the +inf masking.
    smask = smask.at[::37].set(False)
    q = np.asarray(sup)[rng.permutation(ns)[:nq]].astype(np.float32)

    supa = pack_supports_tile_major(
        _pad_rows(sup, tile, PAD_COORD), _pad_rows(smask, tile, False), tile
    )
    g_count = nq // 128
    sel = jnp.asarray(
        rng.integers(0, ns // tile, size=(g_count, m)), jnp.int32
    )
    d2 = np.asarray(
        tiled_candidate_distances(jnp.asarray(q), supa, sel, tile=tile, interpret=True)
    )

    sup_np = np.asarray(sup)
    smask_np = np.asarray(smask)
    for g in range(g_count):
        cand_idx = np.concatenate(
            [np.arange(s * tile, (s + 1) * tile) for s in np.asarray(sel[g])]
        )
        cand = sup_np[cand_idx]
        want = ((q[g * 128:(g + 1) * 128, None, :] - cand[None, :, :]) ** 2).sum(-1)
        got = d2[g * 128:(g + 1) * 128]
        valid = smask_np[cand_idx]
        assert np.all(np.isinf(got[:, ~valid])), "invalid supports must be +inf"
        # atol: the qsq − 2q·c + csq assembly carries ~2⁻²⁴·|q|² absolute
        # f32 rounding (≈2e-5 at 3 m scale) that direct (q−c)² does not —
        # visible only at d² ≈ 0 (query == candidate), far below any
        # radius² the search thresholds (L0 r² ≈ 3.9e-3).
        np.testing.assert_allclose(
            got[:, valid], want[:, valid], rtol=1e-4, atol=3e-5
        )


def test_batched_tiled_search_matches_per_cloud(rng):
    tile = 32
    ns, nq, k, m_tiles, radius = 640, 256, 9, 6, 0.33
    clouds, masks, queries = [], [], []
    for seed in (3, 4):
        r = np.random.default_rng(seed)
        sup, smask = _sorted_cloud(r, ns)
        clouds.append(sup)
        masks.append(smask)
        queries.append(jnp.asarray(np.asarray(sup)[r.permutation(ns)[:nq]]))
    q_b = jnp.stack(queries)
    s_b = jnp.stack(clouds)
    m_b = jnp.stack(masks)

    got_idx, got_lidx, got_tiles = radius_search_tiled_batch(
        q_b, s_b, m_b, radius, k, tile=tile, m_tiles=m_tiles,
        exact=True, return_local=True, interpret=True,
    )
    for b in range(2):
        want_idx, want_lidx, want_tiles = radius_search_tiled(
            queries[b], clouds[b], masks[b], radius, k,
            tile=tile, m_tiles=m_tiles, exact=True, return_local=True,
        )
        gi, wi = np.asarray(got_idx[b]), np.asarray(want_idx)
        # The kernel's cross term is a bf16 limb expansion (~2^-16 rel) vs
        # the XLA path's Precision.HIGHEST — allow rare near-tie flips.
        agree = (gi == wi).mean()
        assert agree >= 0.999, agree
        # Neighbor sets resolve to the same tiles (per-cloud ids).
        np.testing.assert_array_equal(
            np.sort(np.asarray(got_tiles[b]), axis=-1),
            np.sort(np.asarray(want_tiles), axis=-1),
        )
        # lidx is consistent with idx through the tile table wherever the
        # indices agree and are real.
        gl = np.asarray(got_lidx[b])[: nq]
        sel = np.asarray(got_tiles[b])
        real = (gi == wi) & (gi < ns)
        rows, cols = np.nonzero(real)
        groups = rows // 128
        resolved = sel[groups, gl[rows, cols] // tile] * tile + gl[rows, cols] % tile
        np.testing.assert_array_equal(resolved, gi[rows, cols])


def test_batched_tiled_search_dense_fallback(rng):
    """Small clouds (n_tiles <= m_tiles) take the per-cloud dense fallback
    and must match it exactly."""
    tile = 32
    ns, nq, k, radius = 160, 128, 7, 0.6
    sup, smask = _sorted_cloud(rng, ns)
    q = jnp.asarray(np.asarray(sup)[rng.permutation(ns)[:nq]])
    got = radius_search_tiled_batch(
        q[None], sup[None], smask[None], radius, k,
        tile=tile, m_tiles=8, exact=True, return_local=False, interpret=True,
    )
    want = radius_search_tiled(
        q, sup, smask, radius, k, tile=tile, m_tiles=8, exact=True,
    )
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want))
