"""In-repo data artifacts: demo fragment pair + benchmark gt trajectories.

Makes the repo self-contained: the demo pair (the reference's
assets/cloud_bin_{21,34}.pth, re-serialized as .npy) and the
3DMatch/3DLoMatch gt benchmark files (reference configs/benchmarks/*,
Redwood-format gt.log/gt.info, public evaluation data) are vendored
under <repo>/assets and <repo>/configs/benchmarks, so eval/demo/bench
run without any reference checkout present.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Tuple

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent

_REFERENCE_ASSETS = "/root/reference/assets"
_REFERENCE_BENCHMARKS = "/root/reference/configs/benchmarks"


def demo_cloud_pair() -> Tuple[np.ndarray, np.ndarray]:
    """The 3DMatch kitchen demo pair: src [25337,3], tgt [14602,3] float32
    (reference configs/train/indoor.yaml:83-86 demo section).  Prefers the
    vendored .npy; falls back to the reference .pth; synthesizes clouds of
    the same shape as a last resort so benches always run."""
    src_npy = REPO_ROOT / "assets" / "cloud_bin_21.npy"
    tgt_npy = REPO_ROOT / "assets" / "cloud_bin_34.npy"
    if src_npy.exists() and tgt_npy.exists():
        return (
            np.load(src_npy).astype(np.float32),
            np.load(tgt_npy).astype(np.float32),
        )
    src_pth = os.path.join(_REFERENCE_ASSETS, "cloud_bin_21.pth")
    tgt_pth = os.path.join(_REFERENCE_ASSETS, "cloud_bin_34.pth")
    if os.path.exists(src_pth):
        import torch

        return (
            np.asarray(torch.load(src_pth, weights_only=False), dtype=np.float32),
            np.asarray(torch.load(tgt_pth, weights_only=False), dtype=np.float32),
        )
    rng = np.random.default_rng(0)
    return (
        rng.uniform(0, 3, size=(25337, 3)).astype(np.float32),
        rng.uniform(0, 3, size=(14602, 3)).astype(np.float32),
    )


def benchmark_gt_root(benchmark: str) -> str:
    """Directory of per-scene gt.{log,info} for `benchmark` in
    {"3DMatch","3DLoMatch"}; vendored copy preferred, reference fallback."""
    vendored = REPO_ROOT / "configs" / "benchmarks" / benchmark
    if vendored.is_dir():
        return str(vendored)
    return os.path.join(_REFERENCE_BENCHMARKS, benchmark)
