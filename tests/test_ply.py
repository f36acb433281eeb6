"""PLY IO roundtrip + compatibility with the reference's shipped PLY."""
import os

import numpy as np
import pytest

from pcrcg_tpu.geom.ply import read_ply, write_ply


def test_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    colors = (rng.uniform(0, 255, size=(100, 3))).astype(np.uint8)
    path = str(tmp_path / "cloud.ply")
    assert write_ply(path, [pts, colors], ["x", "y", "z", "red", "green", "blue"])
    data = read_ply(path)
    np.testing.assert_allclose(np.stack([data["x"], data["y"], data["z"]], 1), pts)
    np.testing.assert_array_equal(data["red"], colors[:, 0])


@pytest.mark.skipif(
    not os.path.exists("/root/reference/kernels/dispositions/k_015_center_3D.ply"),
    reason="reference ply unavailable",
)
def test_reads_reference_disposition_ply():
    data = read_ply("/root/reference/kernels/dispositions/k_015_center_3D.ply")
    kp = np.stack([data["x"], data["y"], data["z"]], 1)
    assert kp.shape == (15, 3)
    assert abs(np.linalg.norm(kp, axis=1)[1:].mean() - 0.66) < 0.01
