"""Trainer orchestration smoke test: two epochs over a tiny synthetic
dataset exercise the loader, step functions, meters, checkpointing and
resume."""
import os

import numpy as np
import pytest

from pcrcg_tpu.config import tiny_test_config
from pcrcg_tpu.train.trainer import Trainer


class TinyDataset:
    def __init__(self, n=3, seed=0):
        self.n = n
        self.seed = seed

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(self.seed + i)
        base = rng.uniform(0, 0.5, size=(150, 3)).astype(np.float32)
        return {
            "src_pcd": base,
            "tgt_pcd": base[10:140] + rng.normal(scale=0.002, size=(130, 3)).astype(np.float32),
            "rot": np.eye(3, dtype=np.float32),
            "trans": np.zeros(3, np.float32),
        }


@pytest.mark.slow
def test_trainer_two_epochs_and_resume(tmp_path):
    cfg = tiny_test_config(
        exp_dir=str(tmp_path / "exp"),
        max_epoch=2,
        verbose_freq=1,
        num_workers=2,
        snapshot_freq=1,
    )
    datasets = {"train": TinyDataset(3), "val": TinyDataset(2, seed=50)}
    trainer = Trainer(cfg, datasets)
    trainer.train()

    assert os.path.exists(os.path.join(cfg.exp_dir, "log"))
    assert os.path.exists(os.path.join(cfg.exp_dir, "config.json"))
    assert os.path.exists(os.path.join(cfg.exp_dir, "source_backup"))
    assert trainer.ckpt.latest_step() == 1
    assert int(trainer.state.step) == 6  # 3 train batches x 2 epochs

    # Resume from the best_loss alias.
    alias = os.path.join(cfg.exp_dir, "checkpoints", "best_loss")
    assert os.path.exists(alias)
    cfg2 = cfg.replace(pretrain=alias, exp_dir=str(tmp_path / "exp2"))
    trainer2 = Trainer(cfg2, datasets)
    assert trainer2.start_epoch >= 1
    meters = trainer2.eval()
    assert np.isfinite(meters["total"].avg)


@pytest.mark.slow
@pytest.mark.skipif(
    __import__("jax").device_count() < 8, reason="needs 8 virtual devices"
)
def test_trainer_data_parallel_mesh(tmp_path):
    """data_parallel=8 through the PRODUCT surface (Trainer, not raw
    step fns): mesh built, state replicated, batches sharded, loss finite."""
    cfg = tiny_test_config(
        exp_dir=str(tmp_path / "exp_dp"),
        max_epoch=1,
        verbose_freq=1,
        num_workers=1,
        batch_size=8,
        data_parallel=8,
    )
    datasets = {"train": TinyDataset(8), "val": TinyDataset(8, seed=50)}
    trainer = Trainer(cfg, datasets)
    assert trainer.mesh is not None and trainer.mesh.shape["data"] == 8
    trainer.train()
    assert int(trainer.state.step) == 1  # 8 pairs = one sharded batch

    meters = trainer.eval()
    assert np.isfinite(meters["total"].avg)


def test_trainer_rejects_bad_data_parallel(tmp_path):
    cfg = tiny_test_config(
        exp_dir=str(tmp_path / "exp_bad"),
        batch_size=3,
        data_parallel=2,
    )
    with pytest.raises(ValueError, match="multiple"):
        Trainer(cfg, {"train": TinyDataset(4)})
