"""IndoorDataset tests with a synthetic on-disk fixture mimicking the
3DMatch layout (torch-pickled [n,3] fragments + pair-info pickle)."""
import os
import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from pcrcg_tpu.config import tiny_test_config
from pcrcg_tpu.data.indoor import IndoorDataset, euler_zyx_matrix


@pytest.fixture
def fake_root(tmp_path, rng):
    root = tmp_path / "indoor"
    (root / "test/scene").mkdir(parents=True)
    src = rng.uniform(0, 1, size=(400, 3)).astype(np.float32)
    rot = euler_zyx_matrix(rng.random(3))
    trans = rng.normal(size=(3, 1)).astype(np.float32)
    tgt = (src[:350] @ rot.T + trans.T).astype(np.float32)
    torch.save(torch.from_numpy(src), root / "test/scene/cloud_0.pth")
    torch.save(torch.from_numpy(tgt), root / "test/scene/cloud_1.pth")
    infos = {
        "rot": [rot],
        "trans": [trans],
        "src": ["test/scene/cloud_0.pth"],
        "tgt": ["test/scene/cloud_1.pth"],
        "overlap": [0.7],
    }
    info_path = root / "pairs.pkl"
    with open(info_path, "wb") as f:
        pickle.dump(infos, f)
    return str(root), str(info_path), src, tgt, rot, trans


def test_euler_zyx_matches_scipy_convention():
    # Rz(90°) about z maps x->y.
    r = euler_zyx_matrix(np.array([np.pi / 2, 0, 0]))
    np.testing.assert_allclose(r @ np.array([1, 0, 0]), [0, 1, 0], atol=1e-7)


def test_gt_transform_alignment_preserved_under_augmentation(fake_root):
    root, info_path, src, tgt, rot, trans = fake_root
    cfg = tiny_test_config(root=root)
    ds = IndoorDataset(info_path, cfg, data_augmentation=True)
    assert len(ds) == 1
    for _ in range(4):  # several augmentation draws (src- and tgt-side)
        s = ds[0]
        warped = s["src_pcd"] @ s["rot"].T + s["trans"]
        # tgt rows correspond to the first 350 src rows.
        err = np.linalg.norm(warped[:350] - s["tgt_pcd"], axis=-1)
        assert np.median(err) < 3 * cfg.augment_noise


def test_no_augmentation_is_identity(fake_root):
    root, info_path, src, tgt, rot, trans = fake_root
    cfg = tiny_test_config(root=root)
    ds = IndoorDataset(info_path, cfg, data_augmentation=False)
    s = ds[0]
    np.testing.assert_allclose(s["src_pcd"], src, atol=0)
    np.testing.assert_allclose(s["rot"], rot, atol=1e-6)
