"""A/B the KPConv compute paths (xla / reduce / fused) on the real chip:
full KPFCNN forward over the assets pair, readback-timed.

Usage: python scripts/bench_kpconv_impl.py [xla fused reduce] [--grad]
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

    impls = [a for a in sys.argv[1:] if not a.startswith("-")] or ["xla", "fused"]
    with_grad = "--grad" in sys.argv

    src, tgt = load_assets_pair()
    base_cfg = Config()
    batch = make_pair_batch(
        [dict(src_pcd=src, tgt_pcd=tgt, rot=np.eye(3), trans=np.zeros(3))],
        base_cfg.budgets.points[0],
    )
    pts, msk, feats = batch.points[0], batch.masks[0], batch.features[0]
    pyr = jax.jit(
        lambda p, m: build_pyramid(
            p, m, base_cfg.budgets, base_cfg.first_subsampling_dl, base_cfg.conv_radius
        )
    )(pts, msk)
    jax.block_until_ready(pyr)

    def readback(out):
        leaves = jax.tree_util.tree_leaves(out)
        return float(jnp.sum(leaves[0].astype(jnp.float32)))

    outs = {}
    for impl in impls:
        cfg = base_cfg.replace(kpconv_impl=impl)
        model = KPFCNN(cfg)
        variables = jax.jit(model.init)(jax.random.key(0), pyr, feats)
        readback(variables)
        if with_grad:
            def fwd_loss(params, consts, f):
                out = model.apply({"params": params, **consts}, pyr, f)
                return jnp.sum(out["feats_f"] ** 2) + jnp.sum(out["scores_overlap"])

            consts = {k: v for k, v in variables.items() if k != "params"}
            f = jax.jit(jax.grad(fwd_loss), static_argnums=())
            call = lambda ff: f(variables["params"], consts, ff)
        else:
            f = jax.jit(model.apply)
            call = lambda ff: f(variables, ff) if False else f(variables, pyr, ff)
        t_compile0 = time.perf_counter()
        out0 = call(feats)
        readback(out0)
        print(f"{impl}: compile+first {time.perf_counter()-t_compile0:.1f}s", flush=True)
        ts = []
        for i in range(5):
            ff = feats * (1.0 + 1e-6 * (i + 1))
            t0 = time.perf_counter()
            out = call(ff)
            readback(out)
            ts.append((time.perf_counter() - t0) * 1000)
        outs[impl] = out0
        label = "grad" if with_grad else "forward"
        print(f"{impl} {label}: " + " ".join(f"{t:.1f}" for t in ts) + " ms", flush=True)

    if len(outs) > 1 and not with_grad:
        names = list(outs)
        a, b = outs[names[0]], outs[names[1]]
        for key in ("feats_f", "scores_overlap", "scores_saliency"):
            da = np.asarray(a[key], dtype=np.float64)
            db = np.asarray(b[key], dtype=np.float64)
            err = np.max(np.abs(da - db))
            print(f"parity {names[0]} vs {names[1]} {key}: max|Δ| = {err:.3e}", flush=True)
