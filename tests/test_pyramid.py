import jax.numpy as jnp
import numpy as np

from pcrcg_tpu.config import tiny_test_config
from pcrcg_tpu.ops.masked import PAD_COORD
from pcrcg_tpu.ops.pyramid import build_pyramid


def surface_points(rng, n, radius=0.5):
    """Points on a sphere surface — matches the 2D-manifold density of real
    scans (volume-uniform points overflow surface-calibrated budgets)."""
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return (radius * v + rng.normal(scale=0.005, size=(n, 3))).astype(np.float32)


def make_pair(rng, n_src=200, n_tgt=150, n0=256):
    pts = np.full((2, n0, 3), PAD_COORD, np.float32)
    mask = np.zeros((2, n0), bool)
    pts[0, :n_src] = surface_points(rng, n_src)
    pts[1, :n_tgt] = surface_points(rng, n_tgt)
    mask[0, :n_src] = True
    mask[1, :n_tgt] = True
    return jnp.asarray(pts), jnp.asarray(mask)


def test_pyramid_shapes_and_invariants(rng):
    cfg = tiny_test_config(first_subsampling_dl=0.1)
    pts, mask = make_pair(rng)
    pyr = build_pyramid(pts, mask, cfg.budgets, cfg.first_subsampling_dl, cfg.conv_radius)

    b = cfg.budgets
    assert len(pyr.points) == b.num_levels
    for lvl in range(b.num_levels):
        n = b.points[lvl]
        assert pyr.points[lvl].shape == (2, n, 3)
        assert pyr.masks[lvl].shape == (2, n)
        assert pyr.neighbors[lvl].shape == (2, n, b.neighbors[lvl])
        # neighbor indices within [0, n]
        nb = np.asarray(pyr.neighbors[lvl])
        assert nb.min() >= 0 and nb.max() <= n
        # valid queries reference only valid supports
        m = np.asarray(pyr.masks[lvl])
        for c in range(2):
            real_nb = nb[c][m[c]]
            in_range = real_nb[real_nb < n]
            assert m[c][in_range].all()
        # point counts decrease with level
        if lvl > 0:
            assert m.sum() < np.asarray(pyr.masks[lvl - 1]).sum()

    for lvl in range(b.num_levels - 1):
        assert pyr.pools[lvl].shape == (2, b.points[lvl + 1], b.neighbors[lvl])
        assert pyr.upsamples[lvl].shape == (2, b.points[lvl], 1)


def test_every_valid_point_has_a_conv_neighbor(rng):
    # each point is its own neighbor at distance 0
    cfg = tiny_test_config(first_subsampling_dl=0.1)
    pts, mask = make_pair(rng)
    pyr = build_pyramid(pts, mask, cfg.budgets, cfg.first_subsampling_dl, cfg.conv_radius)
    nb0 = np.asarray(pyr.neighbors[0])
    m0 = np.asarray(pyr.masks[0])
    n0 = cfg.budgets.points[0]
    for c in range(2):
        counts = (nb0[c] < n0).sum(-1)
        assert (counts[m0[c]] >= 1).all()
        # first neighbor of a valid point is itself (distance 0, sorted)
        idx = np.arange(n0)[m0[c]]
        assert (nb0[c][m0[c], 0] == idx).all()


def test_upsample_neighbors_point_into_next_level(rng):
    cfg = tiny_test_config(first_subsampling_dl=0.1)
    pts, mask = make_pair(rng)
    pyr = build_pyramid(pts, mask, cfg.budgets, cfg.first_subsampling_dl, cfg.conv_radius)
    for lvl in range(cfg.budgets.num_levels - 1):
        up = np.asarray(pyr.upsamples[lvl])
        n_next = cfg.budgets.points[lvl + 1]
        m = np.asarray(pyr.masks[lvl])
        m_next = np.asarray(pyr.masks[lvl + 1])
        for c in range(2):
            # every valid fine point should find at least one coarse neighbor
            counts = (up[c] < n_next).sum(-1)
            assert (counts[m[c]] >= 1).all()
            real = up[c][m[c]]
            real = real[real < n_next]
            assert m_next[c][real].all()


def test_pyramid_overflow_reporting(rng):
    """with_overflow surfaces per-level voxel-budget overflow: generous
    budgets report none; a starved level-1 budget reports a positive count
    (the silent-corruption case VERDICT r1 flagged)."""
    cfg = tiny_test_config(first_subsampling_dl=0.1)
    pts, mask = make_pair(rng)
    pyr, overflow = build_pyramid(
        pts, mask, cfg.budgets, cfg.first_subsampling_dl, cfg.conv_radius,
        with_overflow=True,
    )
    overflow = np.asarray(overflow)
    assert overflow.shape == (cfg.budgets.num_levels - 1, 2)
    assert (overflow <= 0).all()

    from pcrcg_tpu.config import Budgets

    starved = Budgets(points=(256, 24, 24, 24), neighbors=(16,) * 4, corr_k=8, query_chunk=64)
    _, overflow2 = build_pyramid(
        pts, mask, starved, cfg.first_subsampling_dl, cfg.conv_radius,
        with_overflow=True,
    )
    assert (np.asarray(overflow2)[0] > 0).all()
