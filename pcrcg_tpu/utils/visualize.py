"""Visualization dumps (headless): colored PLY exports of registration
results.

Capability parity with reference datasets/visualize.py's
draw_registration_result/save_ply, re-targeted for headless TPU hosts: the
pair is written as one colored PLY (src gold, tgt blue, src-aligned
optionally applied) viewable in any point-cloud viewer.
"""
from __future__ import annotations

import numpy as np

from pcrcg_tpu.geom.ply import write_ply

SRC_COLOR = (255, 180, 0)
TGT_COLOR = (0, 166, 237)


def save_pair_ply(
    path: str,
    src_pcd: np.ndarray,
    tgt_pcd: np.ndarray,
    transform: np.ndarray | None = None,
) -> str:
    """Writes src (optionally transformed by [3,4] ``transform``) + tgt with
    distinct colors into one PLY; returns the path."""
    src = np.asarray(src_pcd, np.float32)
    tgt = np.asarray(tgt_pcd, np.float32)
    if transform is not None:
        T = np.asarray(transform)
        src = src @ T[:3, :3].T + T[:3, 3]
    pts = np.concatenate([src, tgt], 0)
    colors = np.concatenate(
        [
            np.tile(np.array(SRC_COLOR, np.uint8), (len(src), 1)),
            np.tile(np.array(TGT_COLOR, np.uint8), (len(tgt), 1)),
        ],
        0,
    )
    write_ply(path, [pts, colors], ["x", "y", "z", "red", "green", "blue"])
    return path if path.endswith(".ply") else path + ".ply"
