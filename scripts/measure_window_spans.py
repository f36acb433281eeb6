"""Measure neighbor-index window spans under spatial sorts, on the real
assets pair.

Motivation: if every query tile's neighbor indices fall in a compact
window of (sorted) support rows, the KPConv gather+reduce and the radius
search can both be re-expressed as per-tile windowed one-hot MATMULS that
ride the MXU instead of latency-bound row gathers / full-N distance
matrices.  This script answers: how big must the window be, per pyramid
level, for row-major voxel sort vs Morton (z-curve) sort?
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")
from pcrcg_tpu import native  # noqa: E402


def load_pair():
    from pcrcg_tpu.assets import demo_cloud_pair

    return demo_cloud_pair()


def voxel_ijk(points: np.ndarray, dl: float) -> np.ndarray:
    origin = np.floor(points.min(0) / dl) * dl
    return np.floor((points - origin) / dl).astype(np.int64)


def rowmajor_key(ijk: np.ndarray) -> np.ndarray:
    dims = ijk.max(0) + 1
    return ijk[:, 0] + dims[0] * (ijk[:, 1] + dims[1] * ijk[:, 2])


def morton_key(ijk: np.ndarray, bits: int = 16) -> np.ndarray:
    key = np.zeros(len(ijk), np.int64)
    for b in range(bits):
        for axis in range(3):
            key |= ((ijk[:, axis] >> b) & 1) << (3 * b + axis)
    return key


def span_stats(neigh: np.ndarray, ns: int, tile: int = 128):
    """neigh [Nq, H] with pad == ns; per-tile (max-min) over real entries."""
    nq = neigh.shape[0]
    spans = []
    for t0 in range(0, nq, tile):
        blk = neigh[t0 : t0 + tile]
        real = blk[blk < ns]
        if real.size == 0:
            continue
        spans.append(int(real.max() - real.min() + 1))
    spans = np.asarray(spans)
    return {
        "p50": int(np.percentile(spans, 50)),
        "p90": int(np.percentile(spans, 90)),
        "p99": int(np.percentile(spans, 99)),
        "max": int(spans.max()),
    }


def main():
    src, tgt = load_pair()
    dl0, conv_radius = 0.025, 2.5
    for name, cloud in (("src(25337)", src), ("tgt(14602)", tgt)):
        print(f"=== {name} ===")
        pts = cloud
        r = dl0 * conv_radius
        dl = dl0
        for lvl in range(4):
            for sort_name, keyfn, sort_dl in (
                ("rowmajor@dl", rowmajor_key, dl),
                ("morton@dl", morton_key, dl),
                ("morton@r", morton_key, r),
            ):
                order = np.argsort(keyfn(voxel_ijk(pts, sort_dl)), kind="stable")
                spts = pts[order]
                neigh = native.radius_neighbors(spts, spts, r, 40)
                st = span_stats(neigh, len(spts))
                print(
                    f"L{lvl} n={len(pts):6d} r={r:.3f} sort={sort_name:12s} "
                    f"conv span p50={st['p50']:6d} p90={st['p90']:6d} "
                    f"p99={st['p99']:6d} max={st['max']:6d}"
                )
            # pool search spans: queries = next level, supports = this level
            if lvl < 3:
                dl_next = 2.0 * r / conv_radius
                nxt = native.grid_subsample(pts, dl_next)
                order_s = np.argsort(morton_key(voxel_ijk(pts, dl)), kind="stable")
                order_q = np.argsort(morton_key(voxel_ijk(nxt, dl_next)), kind="stable")
                neigh = native.radius_neighbors(nxt[order_q], pts[order_s], r, 40)
                st = span_stats(neigh, len(pts))
                print(
                    f"L{lvl}->L{lvl+1} pool morton spans p50={st['p50']} "
                    f"p90={st['p90']} p99={st['p99']} max={st['max']}"
                )
                pts = nxt
                dl = dl_next
            r *= 2.0


if __name__ == "__main__":
    main()
