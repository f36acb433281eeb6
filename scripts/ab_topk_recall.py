"""A/B the neighbor-search variants through the full pipeline on the real
chip (VERDICT r1 item 6): dense+approx (round-1 default), tiled+approx
(round-2 default) and tiled+exact, on the assets pair.

Reports per variant: pyramid time, forward descriptor delta vs the exact
reference, first-neighbor agreement (closest-pool correctness), and
RANSAC fitness through the full register_pair path.
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

    variants = {
        "dense_approx": dict(search_impl="dense"),
        "tiled_approx": dict(search_impl="tiled", search_exact=False),
        "tiled_exact": dict(search_impl="tiled", search_exact=True),
    }

    results = {}
    model_vars = None
    for name, kw in variants.items():
        b = Budgets(**{**base.budgets.__dict__, **kw})
        cfg = base.replace(budgets=b)
        pyr_fn = jax.jit(
            lambda p, m, _b=b: build_pyramid(p, m, _b, cfg.first_subsampling_dl, cfg.conv_radius)
        )
        pyr = pyr_fn(pts, msk)
        jax.block_until_ready(pyr)
        # Pyramid timing (readback per iteration, varied inputs).
        ts = []
        for i in range(4):
            p2 = pts * (1.0 + 1e-7 * (i + 1))
            t0 = time.perf_counter()
            out = pyr_fn(p2, msk)
            float(jnp.sum(out.points[-1]))
            ts.append((time.perf_counter() - t0) * 1000)
        model = KPFCNN(cfg)
        if model_vars is None:
            model_vars = jax.jit(model.init)(jax.random.key(0), pyr, feats)
            float(jnp.sum(model_vars["params"]["bottle"]["kernel"]))
        fwd = jax.jit(model.apply)
        out = fwd(model_vars, pyr, feats)
        float(jnp.sum(out["feats_f"]))

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
            res = ransac_pose(k3, p[0][si], p[1][ti], corr, valid, 0.05, 3, 50000,
                              hypothesis_chunk=1024)
            return res.fitness

        fit = float(register(pts, msk, feats, jax.random.key(7)))
        results[name] = dict(
            pyramid_ms=ts, feats=np.asarray(out["feats_f"], np.float64),
            up0=np.asarray(pyr.upsamples[0]), fitness=fit,
        )
        print(f"{name}: pyramid {['%.1f' % t for t in ts]} ms, fitness {fit:.4f}", flush=True)

    ref = results["tiled_exact"]["feats"]
    m0 = np.asarray(msk)
    for name, r in results.items():
        cos = np.sum(r["feats"] * ref, -1)  # both L2-normalized
        cos = cos[m0]
        first_agree = float(np.mean(
            results[name]["up0"][..., 0] == results["tiled_exact"]["up0"][..., 0]
        ))
        print(
            f"{name}: cos-to-exact mean {np.mean(cos):.5f} p1 {np.percentile(cos, 1):.5f}, "
            f"nearest-upsample agreement {first_agree:.4f}, fitness {r['fitness']:.4f}",
            flush=True,
        )
