"""End-to-end throughput benchmark on the real chip.

Measures the full pair -> SE(3) transform path, all on device: pyramid
build (grid subsample + radius search), KPFCNN forward, overlap×saliency
interest-point sampling, feature matching and 50k-hypothesis RANSAC —
i.e. what the reference spreads across DataLoader CPU workers, a GPU
forward, and an offline Open3D RANSAC run.

Prints ONE JSON line: pairs/sec/chip vs the 20 pairs/sec/chip north star
(BASELINE.md).  Uses the in-repo reference assets pair when available,
synthetic clouds otherwise.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def load_assets_pair():
    from pcrcg_tpu.assets import demo_cloud_pair

    return demo_cloud_pair()


def synthetic_images(img_num: int, seed: int = 0, height: int = 240, width: int = 320,
                     quantized: bool = False):
    """Synthetic 240x320 color / 120x160 depth stacks matching the real
    3DMatch image pipeline's shapes (data/images.py) for timing the full
    color+geometry model (reference models/architectures.py:195-514).
    ``quantized`` mirrors the loader's uint8/uint16 payload mode."""
    rng = np.random.default_rng(seed)
    h2, w2 = height // 2, width // 2
    intr = np.array(
        [[577.87, 0, 319.5, 0], [0, 577.87, 239.5, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float64,
    )
    from pcrcg_tpu.ops.projection import adjust_intrinsic

    colors = rng.uniform(0, 1, (2, img_num, height, width, 3)).astype(np.float32)
    depths = rng.uniform(0.5, 3.0, (2, img_num, h2, w2)).astype(np.float32)
    if quantized:
        colors = (colors * 255.0).astype(np.uint8)
        depths = (depths * 1000.0).astype(np.uint16)
    return {
        "colors": colors,
        "depths": depths,
        "world2cam": np.broadcast_to(np.eye(4, dtype=np.float32), (2, img_num, 4, 4)).copy(),
        "valid_maps": np.ones((2, img_num, h2, w2), np.float32),
        "intrinsics": adjust_intrinsic(intr, (640, 480), (w2, h2)).astype(np.float32),
    }


def main(batch_size: int = None):
    from pcrcg_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    batch_size = batch_size or int(os.environ.get("PCRCG_BENCH_BATCH", "1"))
    compute_dtype = os.environ.get("PCRCG_BENCH_DTYPE", "float32")
    # PCRCG_BENCH_IMAGES=1: the flagship color+geometry pipeline (ResNet50
    # over img_num images per cloud + 2D->3D lift ahead of KPFCNN).
    image_feature = os.environ.get("PCRCG_BENCH_IMAGES", "0") == "1"

    from pcrcg_tpu.config import Config
    from pcrcg_tpu.data.pair import make_pair_batch
    from pcrcg_tpu.models.kpfcnn import KPFCNN
    from pcrcg_tpu.models.pcrcg import PCRCG
    from pcrcg_tpu.ops.pyramid import build_pyramid
    from pcrcg_tpu.registration.ransac import feature_correspondences, ransac_pose
    from pcrcg_tpu.registration.sampling import weighted_sample_topk

    cfg = Config(compute_dtype=compute_dtype)
    if "PCRCG_BENCH_FEAT_LIMBS" in os.environ:
        cfg = cfg.replace(
            tiled_feat_limbs=int(os.environ["PCRCG_BENCH_FEAT_LIMBS"])
        )
    if "PCRCG_BENCH_QCHUNK" in os.environ:
        import dataclasses

        cfg = cfg.replace(
            budgets=dataclasses.replace(
                cfg.budgets, query_chunk=int(os.environ["PCRCG_BENCH_QCHUNK"])
            )
        )
    if "PCRCG_BENCH_SEARCH_KERNEL" in os.environ:
        import dataclasses

        cfg = cfg.replace(
            budgets=dataclasses.replace(
                cfg.budgets,
                search_kernel=os.environ["PCRCG_BENCH_SEARCH_KERNEL"] == "1",
            )
        )
    if "PCRCG_BENCH_STILE" in os.environ:
        import dataclasses

        cfg = cfg.replace(
            budgets=dataclasses.replace(
                cfg.budgets, search_tile=int(os.environ["PCRCG_BENCH_STILE"])
            )
        )
    if "PCRCG_BENCH_MTILES" in os.environ:
        import dataclasses

        raw = os.environ["PCRCG_BENCH_MTILES"]
        mt = tuple(int(v) for v in raw.split(",")) if "," in raw else int(raw)
        cfg = cfg.replace(
            budgets=dataclasses.replace(cfg.budgets, search_m_tiles=mt)
        )
    if "PCRCG_BENCH_POINTS" in os.environ:
        # Per-level point budgets, comma list (e.g. "20736,7168,2048,640").
        # Used for the VERDICT-r5 item-9 cost/benefit proxy: a symmetric
        # budget equal to the per-cloud MEAN of an asymmetric src/tgt
        # layout has the same row count the asymmetric refactor would
        # reach, so it measures the perf ceiling of that change without
        # the [2,N]-layout surgery.  NOT an accuracy-preserving setting
        # (the bigger cloud gets truncated) — perf A/B only.
        import dataclasses

        pts_budget = tuple(
            int(v) for v in os.environ["PCRCG_BENCH_POINTS"].split(",")
        )
        cfg = cfg.replace(
            budgets=dataclasses.replace(cfg.budgets, points=pts_budget)
        )
    if "PCRCG_BENCH_RECALL" in os.environ:
        # approx_min_k recall target for the within-candidates top-k —
        # shrinks the [N, m_tiles*128/2] sort widths that dominate the
        # pyramid device time (PERF.md round-5 trace).  Scalar or
        # per-level comma list (e.g. "0.9,0.95").
        import dataclasses

        raw = os.environ["PCRCG_BENCH_RECALL"]
        rt = (
            tuple(float(v) for v in raw.split(","))
            if "," in raw else float(raw)
        )
        cfg = cfg.replace(
            budgets=dataclasses.replace(cfg.budgets, search_recall_target=rt)
        )
    if image_feature:
        cfg = cfg.replace(
            image_feature=True,
            in_feats_dim=129,
            image_compute_dtype=os.environ.get(
                "PCRCG_BENCH_IMG_DTYPE", cfg.image_compute_dtype
            ),
        )
    src, tgt = load_assets_pair()
    batch = make_pair_batch(
        [dict(src_pcd=src, tgt_pcd=tgt, rot=np.eye(3), trans=np.zeros(3))]
        * batch_size,
        cfg.budgets.points[0],
    )
    pyr0 = build_pyramid(
        batch.points[0], batch.masks[0], cfg.budgets, cfg.first_subsampling_dl, cfg.conv_radius
    )
    if image_feature:
        model = PCRCG(cfg)
        # PCRCG_BENCH_IMG_U8=1: quantized image payloads (uint8 colors /
        # uint16 mm depths, converted on device by ImageLift) — ~4x less
        # per-dispatch staging on this tunneled runtime.
        images = {
            k: jnp.asarray(v)
            for k, v in synthetic_images(
                cfg.img_num,
                quantized=os.environ.get("PCRCG_BENCH_IMG_U8", "0") == "1",
            ).items()
        }
        variables = model.init(jax.random.key(0), pyr0, batch.features[0], images)
    else:
        model = KPFCNN(cfg)
        images = None
        variables = model.init(jax.random.key(0), pyr0, batch.features[0])

    n_points = 5000

    # PCRCG_BENCH_PACKARGS=1: ship the model variables as ONE flat buffer
    # per dtype and unflatten inside the jit.  The pytree has hundreds of
    # leaves, and on this tunneled runtime each dispatch serializes every
    # argument buffer handle — per-call overhead scales with the leaf
    # count, not the byte count.  Packing keeps the dispatch at a handful
    # of handles; the in-jit slices/reshapes are free next to the model.
    pack_args = os.environ.get("PCRCG_BENCH_PACKARGS", "1") == "1"
    if pack_args:
        from pcrcg_tpu.utils.packing import pack_pytree

        pack_vars, unpack_vars = pack_pytree(variables)
    else:
        pack_vars, unpack_vars = (lambda v: v), (lambda v: v)
    packed_variables = pack_vars(variables)

    # NOTE: variables/images are explicit jit arguments, NOT closures — a
    # closed-over array is embedded in the HLO as a literal constant, and
    # the ResNet50 params + image stacks blow the module past what the
    # remote-compile transport accepts (broken pipe at ~200 MB modules).
    @jax.jit
    def register_pair_impl(variables, images, points, masks, features, key):
        variables = unpack_vars(variables)
        pyr = build_pyramid(
            points, masks, cfg.budgets, cfg.first_subsampling_dl, cfg.conv_radius
        )
        if image_feature:
            out = model.apply(variables, pyr, features, images)
        else:
            out = model.apply(variables, pyr, features)
        k1, k2, k3 = jax.random.split(key, 3)
        scores = out["scores_overlap"] * out["scores_saliency"]
        src_idx, src_ok = weighted_sample_topk(k1, scores[0], masks[0], n_points)
        tgt_idx, tgt_ok = weighted_sample_topk(k2, scores[1], masks[1], n_points)
        s_pts, s_feats = points[0][src_idx], out["feats_f"][0][src_idx]
        t_pts, t_feats = points[1][tgt_idx], out["feats_f"][1][tgt_idx]
        corr, valid = feature_correspondences(s_feats, t_feats, src_ok, tgt_ok)
        res = ransac_pose(
            k3, s_pts, t_pts, corr, valid,
            distance_threshold=0.05, ransac_n=3, num_iterations=50000,
            hypothesis_chunk=int(os.environ.get("PCRCG_BENCH_HCHUNK", "1024")),
        )
        # The scalar checksum is the bench's completion barrier: returning
        # it from the jit means the timed loop's readback is ONE small
        # device->host transfer, with no eager jnp.sum dispatch per call
        # (every eager op is its own round trip on this tunneled runtime).
        return res.transform, res.fitness, jnp.sum(res.transform) + res.fitness

    def register_pair(points, masks, features, key):
        return register_pair_impl(packed_variables, images, points, masks, features, key)

    # PCRCG_BENCH_LAXMAP=N: run N pairs per dispatch via lax.map (NOT vmap
    # — scalar-prefetch Pallas grids don't vmap, and lax.map keeps the
    # candidate-DMA kernels).  Each lane gets its own stacked input slice
    # so XLA cannot hoist the forward out of the loop (an earlier
    # shared-cloud variant inflated the metric via loop-invariant code
    # motion; its 17.6 number was invalid — see PERF.md "Round-3
    # continuation").  Default 1: with the dispatch path fixed at the root
    # (packed args + no per-call eager ops), the round-4 sweep measured
    # N=1 12.92 / N=4 12.68 geometry and N=1 9.92 / N=2 9.78 images
    # (perf_runs/session_r4f) — the wall is device-bound and lax.map adds
    # per-lane loop overhead, so lanes no longer buy anything.
    lax_n = int(os.environ.get("PCRCG_BENCH_LAXMAP", "1"))
    if batch_size > 1:
        # The vmap branch executes batch_size pairs per call and ignores
        # lax_n — force it to 1 so the metric counts what actually ran.
        lax_n = 1
    if batch_size > 1:
        vmapped = jax.vmap(register_pair_impl, in_axes=(None, None, 0, 0, 0, 0))

        @jax.jit
        def batched(variables, images, p, m, f, ks):
            T, fit, cs = vmapped(variables, images, p, m, f, ks)
            return T, fit, jnp.sum(cs)

        register = lambda p, m, f, ks: batched(packed_variables, images, p, m, f, ks)
        make_keys = lambda k: jax.random.split(k, batch_size)
        args = (batch.points, batch.masks, batch.features)
    elif lax_n > 1:
        # Each lane carries its OWN (points, masks, features, images) slice
        # — with a shared closure-style cloud the body's pyramid+forward
        # (and the whole ResNet50 2D branch in images mode) would be
        # invariant in the mapped key and XLA's loop-invariant code motion
        # could legally compute it ONCE for all N "pairs", which would
        # inflate the metric.  Scanning over stacked per-lane inputs makes
        # every lane's full pipeline provably executed (runtime-data slices
        # cannot be CSE'd).
        @jax.jit
        def register_lax(variables, lane_xs):
            def body(xs):
                p, m, f, k, imgs = xs
                return register_pair_impl(variables, imgs, p, m, f, k)

            T, fit, cs = jax.lax.map(body, lane_xs)
            return T, fit, jnp.sum(cs)

        def _stack(x):
            return jnp.asarray(np.broadcast_to(np.asarray(x), (lax_n,) + x.shape))

        images_stacked = (
            {k: _stack(v) for k, v in images.items()} if image_feature else None
        )
        register = lambda p, m, f, ks: register_lax(
            packed_variables, (p, m, f, ks, images_stacked)
        )
        make_keys = lambda k: jax.random.split(k, lax_n)
        args = (
            _stack(batch.points[0]),
            _stack(batch.masks[0]),
            _stack(batch.features[0]),
        )
    else:
        register = register_pair
        make_keys = lambda k: k
        args = (batch.points[0], batch.masks[0], batch.features[0])
    key = jax.random.key(0)
    # Warmup/compile.
    out = register(*args, make_keys(key))
    jax.block_until_ready(out[0])

    # One extra warm call: the first post-compile execution of a fresh
    # executable carries ~1s of one-time staging on this runtime.
    float(register(*args, make_keys(jax.random.fold_in(key, 999)))[2])

    iters = int(os.environ.get("PCRCG_BENCH_ITERS", "0")) or max(
        8, -(-32 // (batch_size * lax_n))
    )
    # Per-iteration keys are derived OUTSIDE the timed loop: fold_in/split
    # are eager dispatches, i.e. extra round trips per call on this
    # runtime; the timed region should contain exactly one dispatch and
    # one scalar readback per iteration.
    iter_keys = [make_keys(jax.random.fold_in(key, i)) for i in range(iters)]
    jax.block_until_ready(iter_keys)

    trace_dir = os.environ.get("PCRCG_BENCH_TRACE", "")
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    # Pipeline depth: keep a bounded number of pairs in flight and read
    # back result i-depth while pair i computes — the serving pattern
    # (dispatch is async; the readback is the completion barrier on this
    # runtime, where block_until_ready returns early).  Depth 0 = fully
    # serialized, paying the ~28 ms dispatch+readback RTT per pair.
    depth = int(os.environ.get("PCRCG_BENCH_PIPELINE", "2"))
    inflight = []
    t0 = time.perf_counter()
    for ki in iter_keys:
        cs = register(*args, ki)[2]
        inflight.append(cs)
        if len(inflight) > depth:
            float(inflight.pop(0))
    for cs in inflight:
        float(cs)
    dt = time.perf_counter() - t0
    if trace_dir:
        jax.profiler.stop_trace()
    pairs_per_sec = iters * batch_size * lax_n / dt

    metric = "end_to_end_registration_pairs_per_sec_per_chip"
    if image_feature:
        metric = "full_color_geometry_registration_pairs_per_sec_per_chip"
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(pairs_per_sec, 3),
                "unit": "pairs/sec",
                "vs_baseline": round(pairs_per_sec / 20.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
