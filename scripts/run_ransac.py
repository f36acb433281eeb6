"""Registration-recall sweep over interest-point counts.

Capability parity with the reference's run_ransac.sh / batch_ransac.sh +
the (missing-from-repo) scripts/evaluate_predator.py flow: for each
N_POINTS in {250, 500, 1000, 2500, 5000} run the full on-device pipeline
over the 3DMatch/3DLoMatch test split and print the recall table.

    python scripts/run_ransac.py --config configs/test/indoor.yaml \
        [--checkpoint <dir>] [--n_points 250 500 1000 2500 5000]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", default="")
    parser.add_argument("--n_points", type=int, nargs="+", default=[250, 500, 1000, 2500, 5000])
    parser.add_argument("--mutual", action="store_true")
    args = parser.parse_args()

    from pcrcg_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    from pcrcg_tpu.config import load_config
    from pcrcg_tpu.data.indoor import IndoorDataset
    from pcrcg_tpu.data.loader import PairLoader
    from pcrcg_tpu.eval.tester import IndoorTester
    from pcrcg_tpu.train.trainer import init_model

    cfg = load_config(args.config)
    model, variables = init_model(cfg)
    if args.checkpoint:
        from pcrcg_tpu.train.checkpoints import CheckpointManager
        from pcrcg_tpu.train.state import create_train_state

        state = create_train_state(cfg, variables)
        state, _ = CheckpointManager(args.checkpoint).restore(state, path=args.checkpoint)
        variables = state.variables()

    info = os.path.join(os.path.dirname(cfg.val_info or "configs/indoor"), f"{cfg.benchmark}.pkl")
    dataset = IndoorDataset(info, cfg, data_augmentation=False)
    from pcrcg_tpu.assets import benchmark_gt_root

    gt_folder = benchmark_gt_root(cfg.benchmark)
    tester = IndoorTester(cfg, model, variables, gt_folder)

    for n in args.n_points:
        loader = PairLoader(dataset, cfg.budgets.points[0], num_threads=cfg.num_workers)
        out = tester.run(
            dataset, loader, n_points=n, mutual=args.mutual,
            est_folder=os.path.join(cfg.exp_dir, f"est_traj_{n}"),
        )
        res = out["benchmark"]
        print(f"n_points={n}: weighted RR {res.weighted_recall:.4f} "
              f"mean RR {res.mean_recall:.4f} "
              f"IR {out['inlier_ratio_wo_mutual']:.4f}/{out['inlier_ratio_w_mutual']:.4f} "
              f"FMR@0.1 {out['fmr_01']:.4f}", flush=True)


if __name__ == "__main__":
    main()
