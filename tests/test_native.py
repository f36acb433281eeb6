"""Native C++ kernels: build, correctness, and golden cross-checks against
the on-device (jnp) implementations."""
import shutil

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")

from pcrcg_tpu import native
from pcrcg_tpu.ops.neighbors import radius_search
from pcrcg_tpu.ops.subsample import grid_subsample as device_grid_subsample


def test_native_builds():
    assert native.lib() is not None


def test_grid_subsample_cross_check(rng):
    pts = rng.uniform(0, 1, size=(2000, 3)).astype(np.float32)
    host = native.grid_subsample(pts, 0.1)
    dev_pts, dev_mask = device_grid_subsample(
        jnp.asarray(pts), jnp.ones(2000, bool), 0.1, 2000
    )
    dev = np.asarray(dev_pts)[np.asarray(dev_mask)]
    assert host.shape == dev.shape
    # Both emit voxel-key order, but origins/key layouts differ; compare as
    # sets via lexsort.
    np.testing.assert_allclose(
        host[np.lexsort(host.T)], dev[np.lexsort(dev.T)], atol=1e-5
    )


def test_radius_neighbors_cross_check(rng):
    q = rng.uniform(0, 1, size=(300, 3)).astype(np.float32)
    s = rng.uniform(0, 1, size=(500, 3)).astype(np.float32)
    k, r = 24, 0.15
    host = native.radius_neighbors(q, s, r, k)
    dev = np.asarray(radius_search(jnp.asarray(q), jnp.asarray(s), jnp.ones(500, bool), r, k, 128))
    # Equal neighbor SETS per row (ties at equal distance may order differently).
    for i in range(300):
        assert set(host[i][host[i] < 500]) == set(dev[i][dev[i] < 500]), i
    # Sorted ascending by distance (pads at the tail; inf-inf diffs skipped).
    d = np.linalg.norm(s[np.clip(host, 0, 499)] - q[:, None], axis=-1)
    d[host == 500] = np.inf
    diffs = np.diff(d, axis=1)
    assert np.all((diffs >= -1e-6) | np.isnan(diffs))


def test_radius_count_matches_bruteforce(rng):
    q = rng.uniform(0, 1, size=(100, 3)).astype(np.float32)
    s = rng.uniform(0, 1, size=(400, 3)).astype(np.float32)
    counts = native.radius_count(q, s, 0.2)
    d2 = np.sum((q[:, None] - s[None]) ** 2, -1)
    want = (d2 <= 0.2**2).sum(1)
    np.testing.assert_array_equal(counts, want)


def test_calibrate_budgets_on_synthetic(rng):
    from pcrcg_tpu.config import tiny_test_config
    from pcrcg_tpu.data.calibrate import calibrate_budgets, occupancy_report

    cfg = tiny_test_config()

    class DS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            r = np.random.default_rng(i)
            return {
                "src_pcd": r.uniform(0, 0.5, size=(180, 3)).astype(np.float32),
                "tgt_pcd": r.uniform(0, 0.5, size=(150, 3)).astype(np.float32),
            }

    budgets = calibrate_budgets(DS(), cfg, num_samples=4)
    assert len(budgets.points) == cfg.budgets.num_levels
    assert budgets.points[0] >= 180
    assert all(c >= 8 for c in budgets.neighbors)
    rep = occupancy_report(DS(), cfg, num_samples=2)
    assert not any(rep["truncating"])
