"""A/B the tiled-search query_chunk on the pyramid stage (real chip).

The pyramid's searches run as lax.map over query chunks; at the default
1024 the level-0 searches serialize into ~26 dispatch steps.  Larger
chunks mean fewer, fatter ops.  Usage:

    python scripts/ab_query_chunk.py [chunk ...]   # default 1024 2048 4096 8192
"""
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":
    import jax

    from bench import load_assets_pair
    from pcrcg_tpu.config import Config
    from pcrcg_tpu.data.pair import make_pair_batch
    from pcrcg_tpu.ops.pyramid import build_pyramid

    chunks = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096, 8192]
    cfg = Config()
    src, tgt = load_assets_pair()
    batch = make_pair_batch(
        [dict(src_pcd=src, tgt_pcd=tgt, rot=np.eye(3), trans=np.zeros(3))],
        cfg.budgets.points[0],
    )
    pts, msk = batch.points[0], batch.masks[0]
    print("devices:", jax.devices(), flush=True)

    for qc in chunks:
        budgets = dataclasses.replace(cfg.budgets, query_chunk=qc)
        fn = jax.jit(
            lambda p, m, b=budgets: build_pyramid(
                p, m, b, cfg.first_subsampling_dl, cfg.conv_radius
            )
        )
        import jax.numpy as jnp

        t0 = time.perf_counter()
        out = fn(pts, msk)
        # PERF.md rules: block_until_ready returns early on this runtime —
        # force a readback; and vary inputs per rep (result caching).
        float(jnp.sum(out.points[-1]))
        t1 = time.perf_counter()
        reps = 10
        for r in range(reps):
            out = fn(pts + np.float32(1e-6 * (r + 1)), msk)
            float(jnp.sum(out.points[-1]))
        t2 = time.perf_counter()
        print(
            f"query_chunk={qc}: compile+run {t1-t0:.1f}s, steady {(t2-t1)/reps*1e3:.2f} ms",
            flush=True,
        )
