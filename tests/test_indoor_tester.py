"""IndoorTester end-to-end integration test on a synthetic 2-fragment
scene: dataset fixture -> on-device registration -> est.log -> recall
protocol.  The model is untrained, so RANSAC sees near-random descriptors;
the check is plumbing + protocol, not recall quality."""
import os
import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from pcrcg_tpu.config import tiny_test_config
from pcrcg_tpu.data.indoor import IndoorDataset
from pcrcg_tpu.data.loader import PairLoader
from pcrcg_tpu.eval.benchmark_3dmatch import write_trajectory
from pcrcg_tpu.eval.tester import IndoorTester, fragment_id, scene_of
from pcrcg_tpu.train.trainer import init_model


def test_fragment_id_parsing():
    assert fragment_id("test/scene-a/cloud_bin_17.pth") == 17
    assert scene_of("test/scene-a/cloud_bin_17.pth") == "scene-a"


@pytest.mark.slow
def test_indoor_tester_end_to_end(tmp_path, rng):
    scene = "7-scenes-fake"
    root = tmp_path / "data"
    (root / "test" / scene).mkdir(parents=True)
    base = rng.uniform(0, 0.5, size=(200, 3)).astype(np.float32)
    # fragments 0,1,2: pairs (0,2) tested (non-consecutive only)
    for i in range(3):
        torch.save(torch.from_numpy(base + 0.01 * i), root / "test" / scene / f"cloud_bin_{i}.pth")
    infos = {
        "rot": [np.eye(3)],
        "trans": [np.full((3, 1), -0.02, np.float32)],
        "src": [f"test/{scene}/cloud_bin_2.pth"],
        "tgt": [f"test/{scene}/cloud_bin_0.pth"],
        "overlap": [0.9],
    }
    info_path = root / "pairs.pkl"
    with open(info_path, "wb") as f:
        pickle.dump(infos, f)

    # synthetic gt folder with the (0,2) pair
    gt_dir = tmp_path / "gt" / scene
    gt_dir.mkdir(parents=True)
    T = np.eye(4)
    T[:3, 3] = -0.02
    write_trajectory(str(gt_dir / "gt.log"), np.array([[0, 2]]), T[None], 3)
    with open(gt_dir / "gt.info", "w") as f:
        f.write("0\t2\t3\n")
        for row in np.eye(6):
            f.write("\t".join(f"{v:.6e}" for v in row) + "\n")

    cfg = tiny_test_config(root=str(root), exp_dir=str(tmp_path / "exp"))
    ds = IndoorDataset(str(info_path), cfg, data_augmentation=False)
    model, variables = init_model(cfg)
    tester = IndoorTester(cfg, model, variables, str(tmp_path / "gt"))
    loader = PairLoader(ds, cfg.budgets.points[0], num_threads=1)
    out = tester.run(
        ds, loader, n_points=64, num_iterations=256, hypothesis_chunk=64,
        est_folder=str(tmp_path / "est"),
    )
    res = out["benchmark"]
    assert scene in {s for s in os.listdir(tmp_path / "est")}
    assert 0.0 <= res.weighted_recall <= 1.0
    est_log = tmp_path / "est" / scene / "est.log"
    assert est_log.exists()
    first = open(est_log).readline().split()
    assert first[:2] == ["0", "2"]
    # Descriptor-quality metrics are surfaced (reference benchmark_utils
    # get_inlier_ratio + FMR protocol).
    for k in ("inlier_ratio_wo_mutual", "inlier_ratio_w_mutual",
              "fmr_005", "fmr_01", "fmr_02"):
        assert k in out and 0.0 <= out[k] <= 1.0, k


@pytest.mark.slow
def test_indoor_tester_multi_scene_dress_rehearsal(tmp_path, rng):
    """Protocol dress rehearsal at realistic scale: 3 scenes × 10 fragments,
    108 non-consecutive pairs, generated gt.log/gt.info — exercises scene
    grouping, n_frag bookkeeping, the pipelined readback loop and the full
    benchmark() aggregation (the real 3DMatch set is 8 scenes / 1623 pairs,
    reference configs/benchmarks).  Untrained model: the check is plumbing
    and throughput, not recall."""
    import time

    scenes = [f"7-scenes-fake-{c}" for c in "abc"]
    n_frag = 10
    root = tmp_path / "data"
    infos = {"rot": [], "trans": [], "src": [], "tgt": [], "overlap": []}
    for s_idx, scene in enumerate(scenes):
        (root / "test" / scene).mkdir(parents=True)
        base = rng.uniform(0, 0.5, size=(200, 3)).astype(np.float32) + 2.0 * s_idx
        for i in range(n_frag):
            torch.save(
                torch.from_numpy(base + 0.01 * i),
                root / "test" / scene / f"cloud_bin_{i}.pth",
            )
        pairs = [(i, j) for i in range(n_frag) for j in range(i + 2, n_frag)]
        gt_dir = tmp_path / "gt" / scene
        gt_dir.mkdir(parents=True)
        gt_T = []
        for i, j in pairs:
            T = np.eye(4)
            T[:3, 3] = 0.01 * (i - j)  # cloud_i = cloud_j + 0.01*(i-j)
            gt_T.append(T)
            infos["rot"].append(np.eye(3))
            infos["trans"].append(np.full((3, 1), 0.01 * (i - j), np.float32))
            infos["src"].append(f"test/{scene}/cloud_bin_{j}.pth")
            infos["tgt"].append(f"test/{scene}/cloud_bin_{i}.pth")
            infos["overlap"].append(0.9)
        write_trajectory(
            str(gt_dir / "gt.log"), np.asarray(pairs), np.stack(gt_T), n_frag
        )
        with open(gt_dir / "gt.info", "w") as f:
            for i, j in pairs:
                f.write(f"{i}\t{j}\t{n_frag}\n")
                for row in np.eye(6):
                    f.write("\t".join(f"{v:.6e}" for v in row) + "\n")
    n_pairs = len(infos["src"])
    assert n_pairs == 3 * 36

    cfg = tiny_test_config(root=str(root), exp_dir=str(tmp_path / "exp"))
    ds = IndoorDataset(infos, cfg, data_augmentation=False)
    model, variables = init_model(cfg)
    tester = IndoorTester(cfg, model, variables, str(tmp_path / "gt"))
    loader = PairLoader(ds, cfg.budgets.points[0], num_threads=4)
    t0 = time.monotonic()
    out = tester.run(
        ds, loader, n_points=64, num_iterations=128, hypothesis_chunk=64,
        est_folder=str(tmp_path / "est"),
    )
    wall = time.monotonic() - t0
    print(f"dress rehearsal: {n_pairs} pairs in {wall:.1f}s "
          f"({n_pairs / wall:.2f} pairs/s, CPU backend)", flush=True)
    res = out["benchmark"]
    assert set(res.per_scene) == set(scenes)
    for scene in scenes:
        est_log = tmp_path / "est" / scene / "est.log"
        assert est_log.exists()
        lines = open(est_log).read().strip().splitlines()
        assert len(lines) == 36 * 5  # header + 4 matrix rows per pair
        # n_frag bookkeeping: headers carry the scene's fragment count.
        assert lines[0].split()[2] == str(n_frag)
        assert res.per_scene[scene]["n_valid"] == 36
    assert 0.0 <= res.weighted_recall <= 1.0


def test_indoor_tester_refuses_partial_split(tmp_path, rng):
    """Protocol completeness (VERDICT r4 item 8): a loader that under-
    delivers (e.g. drop-last at batch_size>1 on a ragged split) must make
    the tester raise instead of silently scoring a subset."""
    scene = "7-scenes-fake"
    root = tmp_path / "data"
    (root / "test" / scene).mkdir(parents=True)
    base = rng.uniform(0, 0.5, size=(50, 3)).astype(np.float32)
    for i in range(3):
        torch.save(torch.from_numpy(base), root / "test" / scene / f"cloud_bin_{i}.pth")
    infos = {
        "rot": [np.eye(3)],
        "trans": [np.zeros((3, 1), np.float32)],
        "src": [f"test/{scene}/cloud_bin_2.pth"],
        "tgt": [f"test/{scene}/cloud_bin_0.pth"],
        "overlap": [0.9],
    }
    cfg = tiny_test_config(root=str(root), exp_dir=str(tmp_path / "exp"))
    ds = IndoorDataset(infos, cfg, data_augmentation=False)
    model, variables = init_model(cfg)
    tester = IndoorTester(cfg, model, variables, str(tmp_path / "gt"))
    with pytest.raises(RuntimeError, match="scored 0/1"):
        tester.run(ds, [], est_folder=str(tmp_path / "est"))


@pytest.mark.slow
def test_kitti_tester_end_to_end(rng):
    """KITTITester plumbing on synthetic pairs (untrained model — the
    check is the pipelined loop + RRE/RTE bookkeeping, not recall)."""
    from pcrcg_tpu.data.pair import make_pair_batch
    from pcrcg_tpu.eval.tester import KITTITester

    cfg = tiny_test_config()
    samples = []
    for k in range(3):
        base = rng.uniform(0, 0.5, size=(150, 3)).astype(np.float32)
        samples.append(
            dict(src_pcd=base, tgt_pcd=base[10:140] + 0.01,
                 rot=np.eye(3), trans=np.full(3, 0.01, np.float32))
        )
    batch = make_pair_batch(samples, cfg.budgets.points[0])
    model, variables = init_model(cfg)
    tester = KITTITester(cfg, model, variables)
    out = tester.run([(batch, None)], n_points=64)
    assert set(out) == {"registration_recall", "rre_median", "rte_median"}
    assert 0.0 <= out["registration_recall"] <= 1.0
