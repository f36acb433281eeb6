"""KITTIDataset tests over a synthetic on-disk KITTI-odometry layout."""
import os

import numpy as np
import pytest

from pcrcg_tpu.config import tiny_test_config
from pcrcg_tpu.data.kitti import KITTIDataset, icp_point_to_point, voxel_downsample
from pcrcg_tpu.data.pair import make_pair_batch
from pcrcg_tpu.geom import so3


@pytest.fixture
def kitti_root(tmp_path, rng):
    root = tmp_path / "kitti"
    seq = root / "dataset/sequences/00/velodyne"
    poses_dir = root / "dataset/poses"
    seq.mkdir(parents=True)
    poses_dir.mkdir(parents=True)
    # 4 frames moving 12 m apart along +x so consecutive pairs qualify.
    base = rng.uniform(-5, 5, size=(3000, 3)).astype(np.float32)
    poses = []
    for t in range(4):
        shift = np.array([12.0 * t, 0, 0], np.float32)
        pts = (base + shift).astype(np.float32)
        xyzr = np.concatenate([pts, np.ones((len(pts), 1), np.float32)], 1)
        xyzr.tofile(seq / f"{t:06d}.bin")
        pose = np.eye(4)
        # Camera pose: velodyne moves +x in velo frame; cam0 pose encodes it
        # through velo2cam.  For the fixture, store cam translation directly.
        from pcrcg_tpu.data.kitti import velo2cam

        v2c = velo2cam()
        pose[:3, 3] = (v2c[:3, :3] @ np.array([12.0 * t, 0, 0]))
        poses.append(pose[:3].reshape(-1))
    np.savetxt(poses_dir / "00.txt", np.stack(poses))
    split = tmp_path / "splits"
    split.mkdir()
    for s in ("train", "val", "test"):
        (split / f"{s}_kitti.txt").write_text("0\n")
    return str(root), {s: str(split / f"{s}_kitti.txt") for s in ("train", "val", "test")}


def test_voxel_downsample_barycenters():
    pts = np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [1.1, 1.1, 1.1]], np.float32)
    out = voxel_downsample(pts, 0.5)
    assert out.shape == (2, 3)
    assert np.allclose(sorted(out[:, 0]), [0.15, 1.1])


def test_icp_refines_perturbed_init(rng):
    src = rng.uniform(-1, 1, size=(500, 3))
    rot = so3.random_rotation(rng, max_angle=0.1)
    t = np.array([0.05, -0.03, 0.02])
    tgt = src @ rot.T + t
    init = np.eye(4)  # slightly wrong
    T = icp_point_to_point(src, tgt, init, max_dist=0.5, max_iter=100)
    np.testing.assert_allclose(T[:3, :3], rot, atol=1e-3)
    np.testing.assert_allclose(T[:3, 3], t, atol=1e-3)


def test_kitti_pairs_and_samples(kitti_root):
    root, split_files = kitti_root
    cfg = tiny_test_config(
        root=root, first_subsampling_dl=0.3, overlap_radius=0.45, max_points=64,
        dataset="kitti",
    )
    ds = KITTIDataset(cfg, "test", split_files=split_files)
    # frames 12 m apart -> pairs (0,1),(2,3) by the D3Feat walk
    assert len(ds.files) >= 1
    s = ds[0]
    assert {"src_pcd", "tgt_pcd", "raw_src_pcd", "raw_tgt_pcd", "rot", "trans"} <= set(s)
    # GT aligns raw src onto raw tgt (clouds overlap fully in the fixture).
    warped = s["raw_src_pcd"] @ s["rot"].T + s["trans"]
    from scipy.spatial import cKDTree

    d, _ = cKDTree(s["raw_tgt_pcd"]).query(warped)
    assert np.median(d) < 0.5

    # Augmented train sample keeps raw clouds row-aligned with inputs.
    ds_train = KITTIDataset(cfg, "train", split_files=split_files)
    st = ds_train[0]
    assert st["src_pcd"].shape == st["raw_src_pcd"].shape
    batch = make_pair_batch([st], 4096)
    assert batch.raw_points is not None
    assert batch.loss_points is batch.raw_points
