"""Offline budget calibration CLI (replaces the reference's per-run
calibrate_neighbors, datasets/dataloader.py:402-434).

    python scripts/calibrate_budgets.py --config configs/train/indoor.yaml \
        [--split train] [--samples 100] [--keep-ratio 0.8]

Prints the calibrated `tpu.budgets` YAML section plus an occupancy report
against the currently-configured budgets.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--split", default="train")
    parser.add_argument("--samples", type=int, default=100)
    parser.add_argument("--keep-ratio", type=float, default=0.8)
    args = parser.parse_args()

    from pcrcg_tpu.config import load_config
    from pcrcg_tpu.data.calibrate import calibrate_budgets, occupancy_report
    from pcrcg_tpu.main import build_datasets

    cfg = load_config(args.config)
    datasets = build_datasets(cfg)
    dataset = datasets.get(args.split) or next(iter(datasets.values()))

    budgets = calibrate_budgets(dataset, cfg, num_samples=args.samples,
                                keep_ratio=args.keep_ratio)
    print("tpu:")
    print("  budgets:")
    print(f"    points: {list(budgets.points)}")
    print(f"    neighbors: {list(budgets.neighbors)}")
    print(f"    corr_k: {budgets.corr_k}")
    print(f"    query_chunk: {budgets.query_chunk}")
    report = occupancy_report(dataset, cfg, num_samples=min(args.samples, 20))
    print("\noccupancy vs configured budgets:")
    for k, v in report.items():
        print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
