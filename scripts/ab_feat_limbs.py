"""A/B the candidate-DMA kernel's feature-limb count on the real chip.

``tiled_feat_limbs`` controls how many bf16 limbs carry the FEATURE rows
of the one-hot E matmul (ops/kpconv_tiled.py): 2 = hi/lo (~2^-16
relative), 1 = single limb (~2^-9 — the same error grade as the Mosaic
one-bf16-pass f32 W contraction that follows) with ~40% fewer E-matmul
MACs, the forward's dominant cost.  This drives the full register_pair
path both ways with SHARED weights and reports: per-point descriptor
cosine (limbs=1 vs limbs=2), RANSAC fitness, and end-to-end pairs/s.
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
    from pcrcg_tpu.config import Config
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

    pyr = jax.jit(
        lambda p, m: build_pyramid(p, m, base.budgets, base.first_subsampling_dl, base.conv_radius)
    )(pts, msk)
    jax.block_until_ready(pyr.neighbors)

    model_vars = None
    descs = {}
    for limbs in (2, 1):
        cfg = base.replace(tiled_feat_limbs=limbs)
        model = KPFCNN(cfg)
        if model_vars is None:
            model_vars = jax.jit(model.init)(jax.random.key(0), pyr, feats)
            float(jnp.sum(model_vars["params"]["bottle"]["kernel"]))

        fwd = jax.jit(lambda v, f, _m=model: _m.apply(v, pyr, f))
        out = fwd(model_vars, feats)
        descs[limbs] = np.asarray(out["feats_f"])

        @jax.jit
        def register(p, m, f, key, _cfg=cfg, _model=model):
            pyr2 = build_pyramid(p, m, _cfg.budgets, _cfg.first_subsampling_dl, _cfg.conv_radius)
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
        for i in range(8):
            p2 = pts * (1.0 + 1e-7 * (i + 1))
            t0 = time.perf_counter()
            r = register(p2, msk, feats, jax.random.key(i))
            fit = float(r.fitness)
            ts.append((time.perf_counter() - t0) * 1000)
        ms = float(np.median(ts))
        line = f"limbs={limbs}: fitness={fit:.4f} e2e={ms:.1f} ms ({1000.0/ms:.2f} pairs/s)"
        if 2 in descs and limbs != 2:
            a, b = descs[limbs], descs[2]
            m_np = np.asarray(msk).astype(bool)
            cos = np.sum(a * b, -1) / np.maximum(
                np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1), 1e-12
            )
            cos = cos[m_np]
            line += f" desc-cos mean={cos.mean():.5f} p1={np.percentile(cos, 1):.5f}"
        print(line, flush=True)
