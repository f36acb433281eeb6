"""Trustworthy per-call timing of the bench program and its pieces:
per-iteration block_until_ready, varied inputs, wall clocks printed raw."""
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

    cfg = Config()
    src, tgt = load_assets_pair()
    batch = make_pair_batch(
        [dict(src_pcd=src, tgt_pcd=tgt, rot=np.eye(3), trans=np.zeros(3))],
        cfg.budgets.points[0],
    )
    pts, msk, feats = batch.points[0], batch.masks[0], batch.features[0]
    model = KPFCNN(cfg)

    pyr_fn = jax.jit(
        lambda p, m: build_pyramid(p, m, cfg.budgets, cfg.first_subsampling_dl, cfg.conv_radius)
    )
    variables = jax.jit(model.init)(jax.random.key(0), pyr_fn(pts, msk), feats)
    jax.block_until_ready(variables)
    fwd = jax.jit(model.apply)

    n_points = 5000

    @jax.jit
    def register_pair(points, masks, features, key):
        pyr = build_pyramid(points, masks, cfg.budgets, cfg.first_subsampling_dl, cfg.conv_radius)
        out = model.apply(variables, pyr, features)
        k1, k2, k3 = jax.random.split(key, 3)
        scores = out["scores_overlap"] * out["scores_saliency"]
        src_idx, src_ok = weighted_sample_topk(k1, scores[0], masks[0], n_points)
        tgt_idx, tgt_ok = weighted_sample_topk(k2, scores[1], masks[1], n_points)
        s_pts, s_feats = points[0][src_idx], out["feats_f"][0][src_idx]
        t_pts, t_feats = points[1][tgt_idx], out["feats_f"][1][tgt_idx]
        corr, valid = feature_correspondences(s_feats, t_feats, src_ok, tgt_ok)
        res = ransac_pose(k3, s_pts, t_pts, corr, valid, 0.05, 3, 50000, hypothesis_chunk=1024)
        return res.transform

    def bench_fn(name, fn, make_args, iters=5):
        out = fn(*make_args(0))
        jax.block_until_ready(out)
        times = []
        for i in range(1, iters + 1):
            a = make_args(i)
            t0 = time.perf_counter()
            out = fn(*a)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        print(f"{name}: " + " ".join(f"{t*1000:.1f}" for t in times) + " ms", flush=True)

    key = jax.random.key(0)
    pyr0 = pyr_fn(pts, msk)
    jax.block_until_ready(pyr0)

    bench_fn("pyramid", pyr_fn, lambda i: (pts + 1e-6 * i, msk))
    bench_fn("forward", fwd, lambda i: (variables, pyr0, feats))
    bench_fn("register_pair", register_pair,
             lambda i: (pts, msk, feats, jax.random.fold_in(key, i)))
