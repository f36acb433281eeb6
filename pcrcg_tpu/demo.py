"""Demo: register one pair of fragments end-to-end on device.

Capability parity with the reference's demo config surface (configs/train/
indoor.yaml demo section: src_pcd/tgt_pcd/n_points over the in-repo assets
pair).  Usage::

    python -m pcrcg_tpu.demo [--config configs/test/indoor.yaml]
        [--src <pth>] [--tgt <pth>] [--n_points 1000] [--checkpoint <dir>]

Prints the estimated SE(3) transform, RANSAC fitness/rmse and timing.
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="")
    parser.add_argument("--src", default="", help="point-cloud file (.npy/.pth); default: vendored demo pair")
    parser.add_argument("--tgt", default="")
    parser.add_argument("--n_points", type=int, default=1000)
    parser.add_argument("--checkpoint", default="")
    parser.add_argument(
        "--scale",
        type=float,
        default=1.0,
        help="shrink the point/ransac budgets (e.g. 0.1 for a quick CPU run)",
    )
    args = parser.parse_args(argv)

    from pcrcg_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    import os

    import jax

    # The axon TPU plugin ignores the JAX_PLATFORMS env var; honor it
    # explicitly so `JAX_PLATFORMS=cpu python -m pcrcg_tpu.demo --scale .1`
    # really runs on CPU (and doesn't hang when the TPU tunnel is down).
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from pcrcg_tpu.config import Config, load_config
    from pcrcg_tpu.data.indoor import load_fragment
    from pcrcg_tpu.data.pair import make_pair_batch
    from pcrcg_tpu.eval.tester import register_pair_jit
    from pcrcg_tpu.train.trainer import init_model

    cfg = load_config(args.config) if args.config else Config(image_feature=False, in_feats_dim=1)
    if cfg.image_feature:
        # The demo pair has no image stack; run the geometry-only path.
        cfg = cfg.replace(image_feature=False, in_feats_dim=1)
    if args.scale != 1.0:
        from pcrcg_tpu.config import Budgets

        b = cfg.budgets
        cfg = cfg.replace(
            budgets=Budgets(
                points=tuple(max(128, int(p * args.scale)) // 64 * 64 for p in b.points),
                neighbors=b.neighbors,
                corr_k=b.corr_k,
                query_chunk=min(b.query_chunk, 256),
            )
        )
    if args.src or cfg.src_pcd:
        src = load_fragment(args.src if args.src else cfg.src_pcd)
        tgt = load_fragment(args.tgt if args.tgt else cfg.tgt_pcd)
    else:
        from pcrcg_tpu.assets import demo_cloud_pair

        src, tgt = demo_cloud_pair()
    print(f"src {src.shape} tgt {tgt.shape}", flush=True)

    model, variables = init_model(cfg)
    if args.checkpoint and args.checkpoint.endswith((".pth", ".pt", ".tar")):
        # Reference-format torch checkpoint (models/torch_import.py).
        from pcrcg_tpu.models.torch_import import load_kpfcnn

        variables, report = load_kpfcnn(args.checkpoint, variables, strict=False)
        print(f"torch checkpoint: {report['loaded']} tensors imported", flush=True)
    elif args.checkpoint:
        from pcrcg_tpu.train.checkpoints import CheckpointManager
        from pcrcg_tpu.train.state import create_train_state

        state = create_train_state(cfg, variables)
        mgr = CheckpointManager(args.checkpoint)
        state, _ = mgr.restore(state, path=args.checkpoint)
        variables = state.variables()

    batch = make_pair_batch(
        [dict(src_pcd=src, tgt_pcd=tgt, rot=np.eye(3), trans=np.zeros(3))],
        cfg.budgets.points[0],
    )
    iters = max(256, int(50000 * args.scale))
    chunk = min(1024, iters)
    key = jax.random.key(cfg.seed)
    t0 = time.perf_counter()
    res = register_pair_jit(
        model, cfg, variables, batch.points[0], batch.masks[0], batch.features[0],
        key, None, n_points=args.n_points,
        num_iterations=iters, hypothesis_chunk=chunk,
    )
    T = np.asarray(res["transform"])
    print(f"first call (incl. compile): {time.perf_counter()-t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    res = register_pair_jit(
        model, cfg, variables, batch.points[0], batch.masks[0], batch.features[0],
        jax.random.fold_in(key, 1), None, n_points=args.n_points,
        num_iterations=iters, hypothesis_chunk=chunk,
    )
    jax.block_until_ready(res["transform"])
    print(f"steady-state: {time.perf_counter()-t0:.3f}s", flush=True)
    print("estimated transform (src -> tgt):")
    print(np.asarray(res["transform"]))
    print(f"fitness {float(res['fitness']):.4f}  inlier_rmse {float(res['inlier_rmse']):.4f}")


if __name__ == "__main__":
    main()
