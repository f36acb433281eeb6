"""RPMNet transform-chain and ModelNet-metric tests."""
import numpy as np
import pytest

from pcrcg_tpu.data.transforms import (
    Compose,
    FixedResampler,
    RandomCrop,
    RandomJitter,
    RandomTransformSE3_euler,
    Resampler,
    SetDeterministic,
    ShufflePoints,
    SplitSourceRef,
    get_transforms,
)
from pcrcg_tpu.eval.modelnet_metrics import compute_metrics, dcm2euler_xyz, summarize_metrics


def make_sample(rng, n=256):
    return {"points": rng.normal(size=(n, 6)).astype(np.float32), "idx": np.int32(3)}


def test_clean_chain_preserves_correspondence(rng):
    train, test = get_transforms("clean", 45.0, 0.5, 128)
    s = test(make_sample(rng))
    # transform_gt maps src onto ref up to the shuffles.
    g = s["transform_gt"]
    moved = s["points_src"][:, :3] @ g[:3, :3].T + g[:3, 3]
    from scipy.spatial import cKDTree

    d, _ = cKDTree(s["points_ref"][:, :3]).query(moved)
    assert np.max(d) < 1e-5


def test_crop_chain_shapes(rng):
    train, test = get_transforms("crop", 45.0, 0.5, 100, [0.7, 0.7])
    s = train(make_sample(rng, 512))
    assert s["points_src"].shape[0] == 70  # ceil(0.7*100)
    assert s["points_ref"].shape[0] == 70
    assert "transform_gt" in s


def test_deterministic_flag_reproduces(rng):
    _, test = get_transforms("jitter", 45.0, 0.5, 64)
    s1 = test(make_sample(np.random.default_rng(5)))
    s2 = test(make_sample(np.random.default_rng(5)))
    np.testing.assert_allclose(s1["points_src"], s2["points_src"])
    np.testing.assert_allclose(s1["transform_gt"], s2["transform_gt"])


def test_fixed_resampler_tiles():
    pts = np.arange(12, dtype=np.float32).reshape(4, 3)
    out = FixedResampler._resample(pts, 10)
    assert out.shape == (10, 3)
    np.testing.assert_allclose(out[:4], pts)
    np.testing.assert_allclose(out[4:8], pts)


def test_dcm2euler_roundtrip(rng):
    from pcrcg_tpu.data.transforms import _axis_angle_matrix

    rx = _axis_angle_matrix(np.array([1.0, 0, 0]), 0.3)
    ry = _axis_angle_matrix(np.array([0, 1.0, 0]), -0.4)
    rz = _axis_angle_matrix(np.array([0, 0, 1.0]), 0.2)
    # scipy extrinsic 'xyz' (the reference's dcm2euler): R = Rz @ Ry @ Rx
    m = (rz @ ry @ rx)[None]
    deg = dcm2euler_xyz(m)[0]
    np.testing.assert_allclose(np.radians(deg), [0.3, -0.4, 0.2], atol=1e-6)


def test_modelnet_metrics_perfect_prediction(rng):
    b, n = 3, 64
    raw = rng.normal(size=(b, n, 3))
    gts = []
    srcs = []
    for i in range(b):
        t = RandomTransformSE3_euler(45, 0.5)
        g = t.generate_transform(np.random.RandomState(i))
        inv = np.concatenate([g[:3, :3].T, (-g[:3, :3].T @ g[:3, 3])[:, None]], 1)
        srcs.append(raw[i] @ g[:3, :3].T + g[:3, 3])
        gts.append(inv)
    gts = np.stack(gts)
    metrics = compute_metrics(np.stack(srcs), raw, raw, gts, gts)
    assert np.all(metrics["r_mse"] < 1e-6)
    assert np.all(metrics["err_r_deg"] < 1e-2)
    assert np.all(metrics["chamfer_dist"] < 1e-8)
    summary = summarize_metrics(metrics)
    assert set(summary) == {
        "r_rmse", "r_mae", "t_rmse", "t_mae",
        "err_r_deg_mean", "err_r_deg_rmse", "err_t_mean", "err_t_rmse", "chamfer_dist",
    }
