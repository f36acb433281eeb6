"""ModelNet end-to-end integration test on a synthetic HDF5 shard:
dataset fixture → RPMNet crop/jitter transforms → on-device registration →
DCP/RPMNet metric summary, with the modified chamfer computed on the CLEAN
full cloud threaded through the batch (reference lib/tester.py:260,280-286
— not the model-input ref cloud).  The model is untrained; the check is
plumbing + protocol faithfulness, not accuracy."""
import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from pcrcg_tpu.config import tiny_test_config
from pcrcg_tpu.data.loader import PairLoader
from pcrcg_tpu.data.modelnet import get_modelnet_datasets
from pcrcg_tpu.eval.modelnet_metrics import ModelnetTester


def _write_h5(root, rng, n_models=2, n_pts=512):
    root.mkdir(parents=True, exist_ok=True)
    # unit-sphere surface points (transform chain assumes normalized models)
    v = rng.normal(size=(n_models, n_pts, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    with h5py.File(root / "ply_data_test0.h5", "w") as f:
        f.create_dataset("data", data=v)
        f.create_dataset("label", data=np.zeros((n_models, 1), np.int64))
    (root / "test_files.txt").write_text("ply_data_test0.h5\n")
    (root / "shape_names.txt").write_text("airplane\n")


@pytest.mark.slow
def test_modelnet_tester_end_to_end(tmp_path, rng):
    _write_h5(tmp_path / "mn", rng)
    from pcrcg_tpu.config import Budgets

    # modelnet architecture has 2 strided blocks -> 3 pyramid levels
    cfg = tiny_test_config(
        dataset="modelnet", mode="test", root=str(tmp_path / "mn"),
        exp_dir=str(tmp_path / "exp"),
        budgets=Budgets(points=(256, 192, 96), neighbors=(16, 16, 16), corr_k=8, query_chunk=64),
    )
    datasets = get_modelnet_datasets(cfg, noise_type="crop", num_points=256)
    ds = datasets["test"]
    assert len(ds) == 2
    s = ds[0]
    assert s["points_raw"].shape == (512, 3)  # clean full cloud, pre-crop
    # crop-proportion-aware resampling keeps ~p_keep * num_points
    assert 0 < s["src_pcd"].shape[0] <= 256

    from pcrcg_tpu.train.trainer import init_model

    model, variables = init_model(cfg)
    loader = PairLoader(ds, cfg.budgets.points[0], batch_size=1, num_threads=1)
    batch, _ = next(iter(loader))
    assert batch.extras is not None and batch.extras["points_raw"].shape == (1, 512, 3)

    summary = ModelnetTester(cfg, model, variables).run(loader, n_points=64)
    for key in ("r_rmse", "t_rmse", "err_r_deg_mean", "err_t_mean", "chamfer_dist"):
        assert key in summary and np.isfinite(summary[key])


def test_modelnet_protocol_config(tmp_path, rng):
    """RPMNet half1/half2 partial-crop protocol, config-driven end to end
    (reference configs/test/modelnet.yaml:61-75 + datasets/modelnet.py:59-130):
    the shipped category-split files route through Config → get_modelnet_datasets
    with NO keyword overrides, the test split filters to half2 categories only,
    and the crop chain resamples the source to ceil(0.7·num_points)."""
    import math

    root = tmp_path / "mn"
    root.mkdir(parents=True)
    all_cats = [l.strip() for l in open("configs/modelnet/modelnet40_all.txt")]
    half2 = set(l.strip() for l in open("configs/modelnet/modelnet40_half2.txt"))
    (root / "shape_names.txt").write_text("\n".join(all_cats) + "\n")
    # Two models per split half: airplane/bed ∈ half1, laptop/monitor ∈ half2.
    names = ["airplane", "bed", "laptop", "monitor"]
    labels = np.array([[all_cats.index(n)] for n in names], np.int64)
    v = rng.normal(size=(4, 512, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    with h5py.File(root / "ply_data_test0.h5", "w") as f:
        f.create_dataset("data", data=v)
        f.create_dataset("label", data=labels)
    (root / "test_files.txt").write_text("ply_data_test0.h5\n")

    from pcrcg_tpu.config import Budgets

    cfg = tiny_test_config(
        dataset="modelnet", mode="test", root=str(root),
        budgets=Budgets(points=(256, 192, 96), neighbors=(16, 16, 16), corr_k=8, query_chunk=64),
        train_categoryfile="configs/modelnet/modelnet40_half1.txt",
        val_categoryfile="configs/modelnet/modelnet40_half1.txt",
        test_categoryfile="configs/modelnet/modelnet40_half2.txt",
        noise_type="crop", partial=(0.7, 0.7), num_points=256,
        rot_mag=45.0, trans_mag=0.5,
    )
    ds = get_modelnet_datasets(cfg)["test"]  # all knobs come from cfg
    assert len(ds) == 2  # half2 categories only (laptop, monitor)
    for i in range(len(ds)):
        s = ds[i]
        assert all_cats[int(s["label"])] in half2
        # crop [0.7, 0.7]: BOTH clouds resampled to ceil(0.7 * num_points)
        # (RPMNet Resampler with a 2-entry crop_proportion)
        assert s["src_pcd"].shape[0] == math.ceil(0.7 * 256)
        assert s["tgt_pcd"].shape[0] == math.ceil(0.7 * 256)
        # 45° / 0.5 m perturbation bounds (euler-angle chain)
        angle = np.degrees(np.arccos(np.clip((np.trace(s["rot"]) - 1) / 2, -1, 1)))
        assert angle <= 3 * 45.0 + 1e-3  # three stacked 45°-max euler axes
        assert np.all(np.abs(s["trans"]) <= 0.5 + 1e-6)


def test_yaml_protocol_keys_parse(tmp_path):
    """The dataset-section protocol keys in configs/{train,test}/modelnet.yaml
    parse into Config fields (strict unknown-key rejection would throw)."""
    from pcrcg_tpu.config import load_config

    for path in ("configs/train/modelnet.yaml", "configs/test/modelnet.yaml"):
        cfg = load_config(path)
        assert cfg.test_categoryfile.endswith("modelnet40_half2.txt")
        assert cfg.partial == (0.7, 0.7)
        assert cfg.num_points == 1024 and cfg.noise_type == "crop"


def test_chamfer_uses_clean_cloud():
    """The modified chamfer must use the clean raw cloud: with a cropped ref
    and identity transforms, chamfer against the full cloud differs from
    chamfer against the cropped ref (the r1 stand-in)."""
    from pcrcg_tpu.eval.modelnet_metrics import compute_metrics

    rng = np.random.default_rng(0)
    raw = rng.uniform(-1, 1, (1, 200, 3)).astype(np.float32)
    ref = raw[:, :80]  # crop
    src = raw[:, 50:150]
    eye = np.concatenate([np.eye(3), np.zeros((3, 1))], 1)[None].astype(np.float32)
    m_clean = compute_metrics(src, ref, raw, eye, eye)
    m_standin = compute_metrics(src, ref, ref, eye, eye)
    assert m_clean["chamfer_dist"][0] != pytest.approx(m_standin["chamfer_dist"][0])
    # with identity pred==gt and src ⊂ raw, the clean chamfer is ~0
    assert m_clean["chamfer_dist"][0] < 1e-9
