"""CLI entry point: ``python -m pcrcg_tpu.main --config <yaml>``.

Capability parity with reference main.py:17-108: loads the (reference-
compatible) YAML config, builds model/optimizer/datasets, and dispatches
train / val / test by ``config.mode``.
"""
from __future__ import annotations

import argparse
import os


def build_datasets(cfg):
    if cfg.dataset == "indoor":
        from pcrcg_tpu.data.indoor import IndoorDataset, load_split

        if cfg.mode == "train":
            return {
                "train": load_split(cfg, "train"),
                "val": load_split(cfg, "val"),
            }
        if cfg.mode == "val":
            return {"val": load_split(cfg, "val")}
        return {"test": IndoorDataset(
            os.path.join(os.path.dirname(cfg.val_info or "configs/indoor"), f"{cfg.benchmark}.pkl"),
            cfg,
            data_augmentation=False,
        )}
    if cfg.dataset == "kitti":
        from pcrcg_tpu.data.kitti import KITTIDataset

        phases = {"train": ("train", "val"), "val": ("val",), "test": ("test",)}[cfg.mode]
        return {p if p != "test" else "test": KITTIDataset(cfg, p) for p in phases}
    if cfg.dataset == "modelnet":
        from pcrcg_tpu.data.modelnet import get_modelnet_datasets

        return get_modelnet_datasets(cfg)
    raise ValueError(f"Unknown dataset: {cfg.dataset}")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    args = parser.parse_args(argv)

    from pcrcg_tpu.config import load_config
    from pcrcg_tpu.parallel.multihost import initialize as multihost_initialize
    from pcrcg_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    # Multi-host runs (COORDINATOR_ADDRESS set, or TPU-pod auto-detect):
    # must run before any other JAX call; no-op single-process.
    multihost_initialize()
    cfg = load_config(args.config)
    datasets = build_datasets(cfg)

    from pcrcg_tpu.data.loader import PairLoader
    from pcrcg_tpu.train.trainer import Trainer

    trainer = Trainer(cfg, datasets)
    if cfg.mode == "train":
        trainer.train()
    elif cfg.mode == "val":
        trainer.eval()
    elif cfg.mode == "test":
        if cfg.dataset == "indoor":
            from pcrcg_tpu.eval.tester import IndoorTester

            from pcrcg_tpu.assets import benchmark_gt_root

            gt_folder = benchmark_gt_root(cfg.benchmark)
            tester = IndoorTester(cfg, trainer.model, trainer.state.variables(), gt_folder)
            ds = datasets["test"]
            loader = PairLoader(
                ds, cfg.budgets.points[0], batch_size=1,
                num_threads=cfg.num_workers, drop_last=False,
            )
            tester.run(ds, loader, n_points=cfg.n_points)
        elif cfg.dataset == "kitti":
            from pcrcg_tpu.eval.tester import KITTITester

            loader = trainer.loaders["test"]
            KITTITester(cfg, trainer.model, trainer.state.variables()).run(loader)
        else:
            from pcrcg_tpu.eval.modelnet_metrics import ModelnetTester

            ModelnetTester(cfg, trainer.model, trainer.state.variables()).run(
                trainer.loaders["test"]
            )
    else:
        raise ValueError(f"Unknown mode: {cfg.mode}")


if __name__ == "__main__":
    main()
