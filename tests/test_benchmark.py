"""Benchmark-protocol tests against the reference's shipped gt files:
parsing fidelity, and a perfect-estimate run must score recall 1.0 on the
non-consecutive subset."""
import os

import numpy as np
import pytest

from pcrcg_tpu.eval.benchmark_3dmatch import (
    benchmark,
    evaluate_registration,
    read_trajectory,
    read_trajectory_info,
    transformation_error,
    write_trajectory,
)

from pcrcg_tpu.assets import benchmark_gt_root

GT_ROOT = benchmark_gt_root("3DMatch")
pytestmark = pytest.mark.skipif(not os.path.isdir(GT_ROOT), reason="gt files unavailable")


def test_read_trajectory_shapes():
    scene = sorted(os.listdir(GT_ROOT))[0]
    pairs, traj = read_trajectory(os.path.join(GT_ROOT, scene, "gt.log"))
    n_frag, cov = read_trajectory_info(os.path.join(GT_ROOT, scene, "gt.info"))
    assert pairs.shape[0] == traj.shape[0] == cov.shape[0]
    assert traj.shape[1:] == (4, 4)
    assert cov.shape[1:] == (6, 6)
    np.testing.assert_allclose(traj[:, 3, :], [[0, 0, 0, 1]] * len(traj))


def test_perfect_estimates_get_full_recall(tmp_path):
    scene = sorted(os.listdir(GT_ROOT))[0]
    pairs, traj = read_trajectory(os.path.join(GT_ROOT, scene, "gt.log"))
    n_frag, cov = read_trajectory_info(os.path.join(GT_ROOT, scene, "gt.info"))
    prec, rec, flags = evaluate_registration(
        n_frag, traj, pairs.astype(int), pairs.astype(int), traj, cov
    )
    assert rec == 1.0
    assert prec == 1.0


def test_identity_error_is_zero():
    assert transformation_error(np.eye(4), np.eye(6)) == 0.0


def test_full_benchmark_roundtrip(tmp_path):
    # Write perfect est.log for every scene, expect weighted recall 1.0.
    for scene in sorted(os.listdir(GT_ROOT)):
        pairs, traj = read_trajectory(os.path.join(GT_ROOT, scene, "gt.log"))
        n_frag, _ = read_trajectory_info(os.path.join(GT_ROOT, scene, "gt.info"))
        write_trajectory(
            str(tmp_path / scene / "est.log"), pairs[:, :2].astype(int), traj, n_frag
        )
    res = benchmark(str(tmp_path), GT_ROOT)
    assert res.weighted_recall == 1.0
    # gt rotations are not perfectly orthonormal on disk, so even the exact
    # gt transforms carry ~1e-1 deg of self-RRE; translations are exact.
    assert res.mean_median_rre < 1.5
    assert res.mean_median_rte < 1e-6
    assert len(res.per_scene) == 8
