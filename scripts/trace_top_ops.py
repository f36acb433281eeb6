"""Op-level trace of one stage on the real chip: run under
jax.profiler.trace, parse the xplane protobuf, print top ops by self time.

Usage: python scripts/trace_top_ops.py [forward|pyramid|grad|train|images] [kpconv_impl]
"""
import glob
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def parse_xplane(logdir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane under {logdir}"
    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    totals = defaultdict(float)
    for plane in xspace.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                totals[meta.name] += ev.duration_ps / 1e9  # -> ms
    return totals


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

    stage = sys.argv[1] if len(sys.argv) > 1 else "forward"
    impl = sys.argv[2] if len(sys.argv) > 2 else "fused"

    cfg = Config(kpconv_impl=impl)
    # Honor bench.py's env knobs so traces match the benched config.
    if "PCRCG_BENCH_FEAT_LIMBS" in os.environ:
        cfg = cfg.replace(tiled_feat_limbs=int(os.environ["PCRCG_BENCH_FEAT_LIMBS"]))
    if "PCRCG_BENCH_QCHUNK" in os.environ:
        import dataclasses

        cfg = cfg.replace(
            budgets=dataclasses.replace(
                cfg.budgets, query_chunk=int(os.environ["PCRCG_BENCH_QCHUNK"])
            )
        )
    src, tgt = load_assets_pair()
    batch = make_pair_batch(
        [dict(src_pcd=src, tgt_pcd=tgt, rot=np.eye(3), trans=np.zeros(3))],
        cfg.budgets.points[0],
    )
    pts, msk, feats = batch.points[0], batch.masks[0], batch.features[0]

    pyr_fn = jax.jit(
        lambda p, m: build_pyramid(p, m, cfg.budgets, cfg.first_subsampling_dl, cfg.conv_radius)
    )
    pyr = pyr_fn(pts, msk)
    jax.block_until_ready(pyr)

    if stage == "pyramid":
        fn = lambda i: pyr_fn(pts + 1e-6 * i, msk)
    elif stage == "forward":
        model = KPFCNN(cfg)
        variables = jax.jit(model.init)(jax.random.key(0), pyr, feats)
        float(jnp.sum(variables["params"]["bottle"]["kernel"]))
        fwd = jax.jit(model.apply)
        fn = lambda i: fwd(variables, pyr, feats * (1.0 + 1e-6 * i))
    elif stage == "grad":
        model = KPFCNN(cfg)
        variables = jax.jit(model.init)(jax.random.key(0), pyr, feats)
        consts = {k: v for k, v in variables.items() if k != "params"}

        def loss_fn(params, f):
            out = model.apply({"params": params, **consts}, pyr, f)
            return jnp.sum(out["feats_f"] ** 2) + jnp.sum(out["scores_overlap"])

        gfn = jax.jit(jax.grad(loss_fn))
        fn = lambda i: gfn(variables["params"], feats * (1.0 + 1e-6 * i))
    elif stage == "train":
        from pcrcg_tpu.train.state import create_train_state
        from pcrcg_tpu.train.step import train_step

        model = KPFCNN(cfg)
        variables = jax.jit(model.init)(jax.random.key(0), pyr, feats)
        state = create_train_state(cfg, variables)
        step = jax.jit(lambda s, b, k: train_step(model, cfg, s, b, k))
        fn = lambda i: step(state, batch, jax.random.fold_in(jax.random.key(0), i))
    elif stage == "images":
        # Full color+geometry forward (PCRCG = ResNet50-UNet ×2·img_num +
        # 2D→3D lift + KPFCNN) to break down the 2D branch's budget.
        from bench import synthetic_images
        from pcrcg_tpu.models.pcrcg import PCRCG

        cfg = cfg.replace(image_feature=True, in_feats_dim=129)
        model = PCRCG(cfg)
        images = {k: jnp.asarray(v) for k, v in synthetic_images(cfg.img_num).items()}
        variables = jax.jit(model.init)(jax.random.key(0), pyr, feats, images)
        fwd = jax.jit(lambda v, im, f: model.apply(v, pyr, f, im))
        fn = lambda i: fwd(variables, images, feats * (1.0 + 1e-6 * i))
    else:
        raise SystemExit(f"unknown stage {stage}")

    # Warm up (compile + one-time staging).
    out = fn(0)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    out = fn(1)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))

    logdir = f"/tmp/trace_{stage}_{impl}"
    with jax.profiler.trace(logdir):
        out = fn(2)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))

    totals = parse_xplane(logdir)
    items = sorted(totals.items(), key=lambda kv: -kv[1])
    total = sum(totals.values())
    print(f"\n== {stage} ({impl}): total XLA-op self time {total:.1f} ms ==")
    for name, ms in items[:30]:
        print(f"{ms:8.2f} ms  {name[:110]}")
