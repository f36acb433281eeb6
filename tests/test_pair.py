"""Over-budget clouds must be subsampled uniformly at random (not
head-sliced, which drops a spatially coherent chunk — reference caps via
random permutation, datasets/indoor.py:142-147), with a warning, and the
raw (pre-augmentation) cloud must reuse the same row selection."""
import warnings

import numpy as np
import pytest

from pcrcg_tpu.data.pair import make_pair_batch, pad_cloud, subsample_to_budget


def test_pad_cloud_truncation_is_random_not_head():
    # Cloud sorted along x: a head slice would keep only small-x points.
    n, budget = 2000, 500
    pts = np.zeros((n, 3), np.float32)
    pts[:, 0] = np.arange(n)
    with pytest.warns(UserWarning, match="truncated"):
        out, mask = pad_cloud(pts, budget, rng=np.random.default_rng(0))
    assert mask.all()
    kept_x = out[:, 0]
    # uniform sampling => mean ~ n/2, and both tails represented
    assert abs(kept_x.mean() - n / 2) < n * 0.05
    assert kept_x.min() < n * 0.1 and kept_x.max() > n * 0.9
    # kept rows are a subset of the input rows
    assert set(kept_x.astype(int).tolist()) <= set(range(n))
    assert len(set(kept_x.astype(int).tolist())) == budget  # no replacement


def test_pad_cloud_under_budget_keeps_all_rows_no_warning():
    pts = np.arange(30, dtype=np.float32).reshape(10, 3)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        out, mask = pad_cloud(pts, 16)
    np.testing.assert_array_equal(out[:10], pts)
    assert mask[:10].all() and not mask[10:].any()


def test_make_pair_batch_raw_rows_stay_aligned():
    rng = np.random.default_rng(3)
    n, budget = 300, 128
    src = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    raw_src = src + 100.0  # recognizable row-wise offset
    tgt = rng.uniform(-1, 1, (50, 3)).astype(np.float32)
    sample = dict(
        src_pcd=src, tgt_pcd=tgt, raw_src_pcd=raw_src, raw_tgt_pcd=tgt,
        rot=np.eye(3), trans=np.zeros(3),
    )
    with pytest.warns(UserWarning):
        batch = make_pair_batch([sample], budget, rng=np.random.default_rng(7))
    pts = np.asarray(batch.points[0, 0])
    raw = np.asarray(batch.raw_points[0, 0])
    msk = np.asarray(batch.masks[0, 0])
    assert msk.all()
    # identical selection: raw row == points row + 100 everywhere
    np.testing.assert_allclose(raw[msk], pts[msk] + 100.0, atol=1e-5)


def test_subsample_to_budget_none_when_fits():
    assert subsample_to_budget(10, 10) is None
    assert subsample_to_budget(5, 10) is None
    sel = subsample_to_budget(11, 10, np.random.default_rng(0))
    assert sel is not None and len(sel) == 10 and len(set(sel.tolist())) == 10
