import jax.numpy as jnp
import numpy as np

from pcrcg_tpu.ops.masked import PAD_COORD
from pcrcg_tpu.ops.subsample import grid_subsample


def oracle_grid_subsample(points, dl):
    """Numpy oracle replicating reference cpp_subsampling/
    grid_subsampling.cpp:5-106 (barycenter per voxel, origin corner
    floor(min/dl)*dl)."""
    origin = np.floor(points.min(0) / dl) * dl
    ijk = np.floor((points - origin) / dl).astype(np.int64)
    cells = {}
    for p, key in zip(points, map(tuple, ijk)):
        acc = cells.setdefault(key, [np.zeros(3), 0])
        acc[0] += p
        acc[1] += 1
    return {k: v[0] / v[1] for k, v in cells.items()}


def run(points, dl, n_out=128):
    n = len(points)
    pad_pts = np.full((n_out * 2, 3), PAD_COORD, np.float32)
    pad_pts[:n] = points
    mask = np.zeros(n_out * 2, bool)
    mask[:n] = True
    pooled, pooled_mask = grid_subsample(jnp.asarray(pad_pts), jnp.asarray(mask), dl, n_out)
    pooled, pooled_mask = np.asarray(pooled), np.asarray(pooled_mask)
    return pooled[pooled_mask]


def test_matches_oracle_barycenters(rng):
    pts = rng.uniform(-1, 1, size=(100, 3)).astype(np.float32)
    dl = 0.4
    got = run(pts, dl)
    want = oracle_grid_subsample(pts, dl)
    assert len(got) == len(want)
    # match each output barycenter to an oracle barycenter
    want_arr = np.stack(list(want.values()))
    for g in got:
        d = np.linalg.norm(want_arr - g, axis=1)
        assert d.min() < 1e-5


def test_single_voxel_mean(rng):
    pts = (rng.uniform(0, 0.01, size=(10, 3)) + 0.5).astype(np.float32)
    got = run(pts, 1.0)
    assert got.shape == (1, 3)
    np.testing.assert_allclose(got[0], pts.mean(0), atol=1e-6)


def test_pads_do_not_contribute(rng):
    pts = rng.uniform(-1, 1, size=(30, 3)).astype(np.float32)
    a = run(pts, 0.5, n_out=40)
    # same points, different pad amount -> same set of barycenters
    b = run(pts, 0.5, n_out=80)
    assert len(a) == len(b)
    for g in a:
        assert np.min(np.linalg.norm(b - g, axis=1)) < 1e-6


def test_overflow_count_reported(rng):
    """return_count exposes the number of distinct occupied voxels; a count
    above n_out means the OOB-scatter silently dropped voxels."""
    pts = rng.uniform(-1, 1, size=(64, 3)).astype(np.float32)
    mask = np.ones(64, bool)
    # tiny dl -> every point its own voxel; n_out=16 < 64 voxels -> overflow
    pooled, pmask, count = grid_subsample(
        jnp.asarray(pts), jnp.asarray(mask), 1e-4, 16, return_count=True
    )
    assert int(count) == 64
    assert int(count) > 16  # overflow detectable by the caller
    # generous budget: count == #voxels == #valid outputs, no overflow
    pooled, pmask, count = grid_subsample(
        jnp.asarray(pts), jnp.asarray(mask), 0.5, 128, return_count=True
    )
    assert int(count) == int(np.asarray(pmask).sum())
    assert int(count) <= 128


def test_grid_subsample_morton_order_same_voxels():
    """order='morton' must produce the same voxel barycenters as the
    raster order (as a set) with output rows Z-ordered (the tile-pruned
    search's input contract) and valid rows front-packed."""
    import jax.numpy as jnp
    from pcrcg_tpu.ops.subsample import grid_subsample, morton_code

    del morton_code  # Z-order is checked on the VOXEL grid below
    from pcrcg_tpu.ops.subsample import _spread_bits_10

    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 1.0, size=(500, 3)).astype(np.float32)
    mask = np.ones(500, bool)
    mask[450:] = False
    # Budget must hold every occupied voxel: under overflow the DROP SET
    # depends on the key order, so the two orders legitimately differ
    # (overflow levels are flagged corrupt by the occupancy checks).
    a, am = grid_subsample(jnp.asarray(pts), jnp.asarray(mask), 0.1, 512)
    b, bm = grid_subsample(jnp.asarray(pts), jnp.asarray(mask), 0.1, 512, order="morton")
    a, am, b, bm = map(np.asarray, (a, am, b, bm))
    assert am.sum() == bm.sum() < 512
    sa = sorted(map(tuple, a[am].round(5).tolist()))
    sb = sorted(map(tuple, b[bm].round(5).tolist()))
    assert sa == sb
    # Front-packed valid rows.
    assert bm[: bm.sum()].all() and not bm[bm.sum():].any()
    # Z-ordered on the voxel grid the subsample used.
    dl = 0.1
    origin = np.floor(pts[mask].min(0) / dl) * dl
    ijk = np.floor((b[bm] - origin) / dl).astype(np.int64)
    sp = np.asarray(_spread_bits_10(jnp.asarray(ijk)))
    codes = sp[:, 0] | (sp[:, 1] << 1) | (sp[:, 2] << 2)
    assert (np.diff(codes) >= 0).all()
