"""Train-step throughput at realistic 3DMatch sizes on the current backend.

Measures the full jitted train step (pyramid + forward + loss + backward +
update) with per-call host readback.  PCRCG_BENCH_BATCH controls the pair
batch; PCRCG_BENCH_DTYPE the compute dtype.
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
    from pcrcg_tpu.train.state import create_train_state
    from pcrcg_tpu.train.step import train_step

    bsz = int(os.environ.get("PCRCG_BENCH_BATCH", "1"))
    cfg = Config(compute_dtype=os.environ.get("PCRCG_BENCH_DTYPE", "float32"))
    src, tgt = load_assets_pair()
    rng = np.random.default_rng(0)
    samples = [
        dict(
            src_pcd=src,
            tgt_pcd=tgt,
            rot=np.eye(3),
            trans=np.zeros(3),
        )
    ] * bsz
    batch = make_pair_batch(samples, cfg.budgets.points[0])

    model = KPFCNN(cfg)
    pyr = build_pyramid(
        batch.points[0], batch.masks[0], cfg.budgets, cfg.first_subsampling_dl, cfg.conv_radius
    )
    variables = jax.jit(model.init)(jax.random.key(0), pyr, batch.features[0])
    state = create_train_state(cfg, variables, steps_per_epoch=100)

    key = jax.random.key(0)
    state, stats = train_step(model, cfg, state, batch, key)
    print("first step total:", float(stats["total"]), flush=True)
    for i in range(3):
        t0 = time.perf_counter()
        state, stats = train_step(model, cfg, state, batch, jax.random.fold_in(key, i))
        total = float(stats["total"])  # host readback forces completion
        dt = time.perf_counter() - t0
        print(
            f"train_step {i}: {dt*1000:.1f} ms -> {bsz/dt:.2f} pairs/s (loss {total:.3f})",
            flush=True,
        )
