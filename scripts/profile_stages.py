"""Stage-by-stage timing on the current backend: pyramid / forward / ransac.

Usage: python scripts/profile_stages.py [stage ...]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    fn(*args)
    out = fn(*args)
    jax.block_until_ready(out)
    t2 = time.perf_counter()
    print(f"{name}: compile+run {t1-t0:.2f}s, steady {(t2-t1)/2:.4f}s", flush=True)
    return out


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from bench import load_assets_pair
    from pcrcg_tpu.config import Config
    from pcrcg_tpu.data.pair import make_pair_batch
    from pcrcg_tpu.models.kpfcnn import KPFCNN
    from pcrcg_tpu.ops.pyramid import build_pyramid
    from pcrcg_tpu.registration.ransac import ransac_pose
    from pcrcg_tpu.registration.sampling import weighted_sample_topk

    stages = sys.argv[1:] or ["pyramid", "forward", "ransac"]
    cfg = Config()
    src, tgt = load_assets_pair()
    batch = make_pair_batch(
        [dict(src_pcd=src, tgt_pcd=tgt, rot=np.eye(3), trans=np.zeros(3))],
        cfg.budgets.points[0],
    )
    pts, msk, feats = batch.points[0], batch.masks[0], batch.features[0]
    print("devices:", jax.devices(), flush=True)

    pyr_fn = jax.jit(
        lambda p, m: build_pyramid(p, m, cfg.budgets, cfg.first_subsampling_dl, cfg.conv_radius)
    )
    pyr = None
    if "pyramid" in stages or "forward" in stages:
        pyr = timed("pyramid", pyr_fn, pts, msk)
        for i, m in enumerate(pyr.masks):
            print(f"  level {i}: occupancy {np.asarray(m).sum(1)} / {m.shape[1]}", flush=True)

    if "forward" in stages:
        model = KPFCNN(cfg)
        t0 = time.perf_counter()
        variables = model.init(jax.random.key(0), pyr, feats)
        print(f"init: {time.perf_counter()-t0:.2f}s", flush=True)
        fwd = jax.jit(lambda v, p, f: model.apply(v, p, f))
        out = timed("forward", fwd, variables, pyr, feats)

    if "ransac" in stages:
        n = 5000
        rngn = np.random.default_rng(0)
        s = rngn.uniform(-1, 1, size=(n, 3)).astype(np.float32)
        t = s.copy()
        corr = np.arange(n, dtype=np.int32)
        corr[: n // 2] = rngn.integers(0, n, n // 2)
        rfn = jax.jit(
            lambda k, s_, t_, c: ransac_pose(
                k, s_, t_, c, jnp.ones(n, bool), 0.05, 3, 50000, hypothesis_chunk=1024
            )
        )
        timed("ransac50k", rfn, jax.random.key(0), jnp.asarray(s), jnp.asarray(t), jnp.asarray(corr))
