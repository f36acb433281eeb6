"""A/B the candidate-tile budget (search_m_tiles) on the real chip.

The one-hot E-matmul in the candidate-DMA KPConv kernel costs
O(m_tiles * tile) per output row, and the tiled search's distance matmul
scales the same way — m_tiles is the single knob trading neighbor recall
for most of the forward+pyramid device time.  This drives the full
register_pair path per setting and reports: neighbor recall vs the exact
search (per level), RANSAC fitness, and end-to-end pairs/s.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":
    from pcrcg_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from bench import load_assets_pair
    from pcrcg_tpu.config import Config, Budgets
    from pcrcg_tpu.data.pair import make_pair_batch
    from pcrcg_tpu.models.kpfcnn import KPFCNN
    from pcrcg_tpu.ops.pyramid import build_pyramid
    from pcrcg_tpu.registration.ransac import feature_correspondences, ransac_pose
    from pcrcg_tpu.registration.sampling import weighted_sample_topk

    src, tgt = load_assets_pair()
    base = Config()
    batch = make_pair_batch(
        [dict(src_pcd=src, tgt_pcd=tgt, rot=np.eye(3), trans=np.zeros(3))],
        base.budgets.points[0],
    )
    pts, msk, feats = batch.points[0], batch.masks[0], batch.features[0]

    def neighbor_recall(pyr, pyr_exact):
        """Per level: fraction of exact in-radius neighbor ids recovered."""
        rec = []
        for lvl in range(len(pyr.neighbors)):
            got = np.asarray(pyr.neighbors[lvl])
            want = np.asarray(pyr_exact.neighbors[lvl])
            ns = pyr.points[lvl].shape[1]
            w_valid = want < ns
            hits = 0
            total = int(w_valid.sum())
            # row-wise set intersection (loop is fine: host-side, once)
            for b in range(got.shape[0]):
                for i in range(0, got.shape[1], 17):  # sampled rows
                    wr = want[b, i][w_valid[b, i]]
                    if wr.size:
                        hits += np.isin(wr, got[b, i]).sum()
            totals = sum(
                int(w_valid[b, i].sum())
                for b in range(got.shape[0])
                for i in range(0, got.shape[1], 17)
            )
            rec.append(hits / max(totals, 1))
        return rec

    exact_b = Budgets(**{**base.budgets.__dict__, "search_impl": "tiled", "search_exact": True, "search_m_tiles": 40})
    pyr_exact = jax.jit(
        lambda p, m: build_pyramid(p, m, exact_b, base.first_subsampling_dl, base.conv_radius)
    )(pts, msk)
    jax.block_until_ready(pyr_exact.neighbors)

    # argv: search_tile:m_tiles[:recall_target] — m_tiles and
    # recall_target each an int/float OR a per-level comma list, e.g.
    # 128:12  128:12,10,8,8  128:12:0.9  128:12:0.9,0.95
    def parse(arg):
        parts = arg.split(":")
        tile_s, m_s = parts[0], parts[1]
        m = tuple(int(v) for v in m_s.split(",")) if "," in m_s else int(m_s)
        rt = 0.95
        if len(parts) > 2:
            rt = (
                tuple(float(v) for v in parts[2].split(","))
                if "," in parts[2] else float(parts[2])
            )
        return int(tile_s), m, rt

    combos = [parse(arg) for arg in sys.argv[1:]] or [
        (128, 24, 0.95), (128, 16, 0.95), (128, 12, 0.95)
    ]

    model_vars = None
    for tile_sz, m_tiles, recall_t in combos:
        b = Budgets(**{**base.budgets.__dict__,
                       "search_tile": tile_sz, "search_m_tiles": m_tiles,
                       "search_recall_target": recall_t})
        cfg = base.replace(budgets=b)
        pyr_fn = jax.jit(
            lambda p, m, _b=b: build_pyramid(p, m, _b, cfg.first_subsampling_dl, cfg.conv_radius)
        )
        pyr = pyr_fn(pts, msk)
        jax.block_until_ready(pyr.neighbors)
        rec = neighbor_recall(pyr, pyr_exact)

        model = KPFCNN(cfg)
        if model_vars is None:
            model_vars = jax.jit(model.init)(jax.random.key(0), pyr, feats)
            float(jnp.sum(model_vars["params"]["bottle"]["kernel"]))

        @jax.jit
        def register(p, m, f, key, _b=b, _cfg=cfg, _model=model):
            pyr2 = build_pyramid(p, m, _b, _cfg.first_subsampling_dl, _cfg.conv_radius)
            o = _model.apply(model_vars, pyr2, f)
            k1, k2, k3 = jax.random.split(key, 3)
            scores = o["scores_overlap"] * o["scores_saliency"]
            si, sok = weighted_sample_topk(k1, scores[0], m[0], 5000)
            ti, tok = weighted_sample_topk(k2, scores[1], m[1], 5000)
            corr, valid = feature_correspondences(
                o["feats_f"][0][si], o["feats_f"][1][ti], sok, tok
            )
            res = ransac_pose(
                k3, p[0][si], p[1][ti], corr, valid,
                distance_threshold=0.05, num_iterations=50000,
            )
            return res

        res = register(pts, msk, feats, jax.random.key(0))
        jax.block_until_ready(res)
        ts = []
        for i in range(6):
            p2 = pts * (1.0 + 1e-7 * (i + 1))
            t0 = time.perf_counter()
            r = register(p2, msk, feats, jax.random.key(i))
            fit = float(r.fitness)
            ts.append((time.perf_counter() - t0) * 1000)
        ms = float(np.median(ts))
        print(
            f"tile={tile_sz} m_tiles={m_tiles} rt={recall_t}: "
            f"recall/lvl={['%.4f' % r for r in rec]} "
            f"fitness={fit:.4f} e2e={ms:.1f} ms ({1000.0/ms:.2f} pairs/s)",
            flush=True,
        )
