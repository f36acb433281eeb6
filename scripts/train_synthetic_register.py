"""Accuracy evidence: train KPFCNN from scratch until on-device RANSAC
recovers ground-truth transforms within the 3DMatch protocol threshold.

Pairs are synthesized from the in-repo reference assets clouds
(cloud_bin_21/34 — real indoor scan geometry): two overlapping half-space
crops per sample, the target crop moved by a random SE(3), plus the
reference's own augmentation noise (datasets/indoor.py:151-168).  Success
criterion mirrors the benchmark oracle (lib/benchmark.py:213-243): RMSE of
the estimated-vs-GT transform over GT-correspondence points <= 0.2 m.

Writes a JSONL metric trajectory to perf_runs/accuracy_evidence.jsonl and
prints a final summary line.

Usage: python scripts/train_synthetic_register.py [--steps 3000]
       [--eval-every 250] [--budget 26624] [--lr 0.01]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def random_rotation(rng, max_deg: float = 45.0) -> np.ndarray:
    """Random-axis rotation with angle uniform in [0, max_deg].  Real
    3DMatch fragment pairs have moderate relative rotations (consecutive
    camera motion); full-SO(3) relative poses are a rotation-robustness
    property the reference buys with its 150-epoch schedule, not a
    requirement of the registration demo."""
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    angle = np.deg2rad(rng.uniform(0.0, max_deg))
    kx, ky, kz = axis
    k_mat = np.array([[0, -kz, ky], [kz, 0, -kx], [-ky, kx, 0]])
    rot = np.eye(3) + np.sin(angle) * k_mat + (1 - np.cos(angle)) * (k_mat @ k_mat)
    return rot.astype(np.float32)


def make_synthetic_pair(cloud: np.ndarray, rng, noise: float = 0.005,
                        max_rot_deg: float = 45.0, resample_frac: float = 1.0):
    """Two overlapping half-space crops of ``cloud``; the tgt crop is moved
    by a random SE(3).  GT satisfies rot @ src + trans = tgt.

    ``resample_frac < 1`` subsamples each crop INDEPENDENTLY (different
    random subsets), so overlap-region points are no longer 1:1 identical —
    the property real pairs have (two different scans of one surface) that
    makes matching honest rather than point-identity lookup."""
    center = cloud.mean(0)
    normal = rng.normal(size=3)
    normal /= np.linalg.norm(normal)
    d = (cloud - center) @ normal
    band = 0.35 * d.std()
    src = cloud[d > -band]
    tgt0 = cloud[d < band]
    if resample_frac < 1.0:
        ks = max(int(len(src) * resample_frac), 1)
        kt = max(int(len(tgt0) * resample_frac), 1)
        src = src[rng.permutation(len(src))[:ks]]
        tgt0 = tgt0[rng.permutation(len(tgt0))[:kt]]
    rot = random_rotation(rng, max_rot_deg)
    trans = rng.uniform(-1.0, 1.0, 3).astype(np.float32)
    src0 = src
    tgt = tgt0 @ rot.T + trans
    src = src + rng.normal(scale=noise, size=src.shape)
    tgt = tgt + rng.normal(scale=noise, size=tgt.shape)
    # src0/tgt0: the crops in the ORIGINAL cloud frame — procedural colors
    # looked up there are identical on the overlap, like real RGB-D.
    return (src.astype(np.float32), tgt.astype(np.float32), rot, trans,
            src0.astype(np.float32), tgt0.astype(np.float32))


_BASE_INTR = np.array(
    [[577.87, 0, 319.5, 0], [0, 577.87, 239.5, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
    np.float64,
)


def procedural_colors(points: np.ndarray, seed: int = 0) -> np.ndarray:
    """Deterministic RGB 'texture' of world position: overlapping regions
    of the two crops render identical colors from any view (the property
    the real RGB-D data has and that the 2D branch exploits)."""
    r = np.random.default_rng(seed)
    w = r.normal(scale=6.0, size=(3, 3))
    b = r.uniform(0, 2 * np.pi, 3)
    return (0.5 + 0.5 * np.sin(points @ w + b)).astype(np.float32)


def _lookat_world2cam(eye: np.ndarray, center: np.ndarray) -> np.ndarray:
    """OpenCV-style world->camera [4,4]: +z forward toward ``center``.
    Any orthonormal frame works — the lift uses the same matrix."""
    f = center - eye
    f = f / np.linalg.norm(f)
    up = np.array([0.0, 1.0, 0.0])
    if abs(np.dot(f, up)) > 0.95:
        up = np.array([1.0, 0.0, 0.0])
    r = np.cross(f, up)
    r /= np.linalg.norm(r)
    d = np.cross(f, r)
    rot = np.stack([r, d, f])  # rows: camera x/y/z in world
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = rot
    m[:3, 3] = -rot @ eye
    return m


def render_views(points: np.ndarray, colors: np.ndarray, img_num: int, rng,
                 height: int = 240, width: int = 320):
    """Pinhole renders of the colored cloud (nearest-point splats): color
    [I,H,W,3], depth [I,H/2,W/2] (meters), valid [I,H/2,W/2], world2cam
    [I,4,4] — the exact shapes the ImageLift consumes, geometry-consistent
    with ops/projection.project_points (depth-consistency 0.1 m)."""
    from pcrcg_tpu.ops.projection import adjust_intrinsic

    h2, w2 = height // 2, width // 2
    # Everything renders on the half-res grid (the lift's projection
    # resolution); colors upsample 2x to the backbone's input size.
    intr_h = adjust_intrinsic(_BASE_INTR, (640, 480), (w2, h2))
    center = points.mean(0)
    radius = float(np.linalg.norm(points - center, axis=1).max())
    imgs = np.zeros((img_num, height, width, 3), np.float32)
    deps = np.zeros((img_num, h2, w2), np.float32)
    w2c = np.zeros((img_num, 4, 4), np.float32)
    for i in range(img_num):
        direction = rng.normal(size=3)
        direction /= np.linalg.norm(direction)
        eye = center + direction * (2.2 * radius)
        m = _lookat_world2cam(eye, center)
        w2c[i] = m
        cam = points @ m[:3, :3].T + m[:3, 3]
        z = cam[:, 2]
        front = z > 0.05

        def splat(intr, hh, ww, values, out):
            u = (intr[0, 0] * cam[front, 0] / z[front] + intr[0, 2]).astype(np.int64)
            v = (intr[1, 1] * cam[front, 1] / z[front] + intr[1, 2]).astype(np.int64)
            ok = (u >= 0) & (u < ww) & (v >= 0) & (v < hh)
            order = np.argsort(-z[front][ok])  # nearest written last -> wins
            out[v[ok][order], u[ok][order]] = values[front][ok][order]

        # Colors splat at HALF res (dense for scan-sized clouds) and
        # upsample 2x — point splats at full res leave mostly-black images;
        # the backbone halves the resolution again anyway.
        img_h = np.zeros((h2, w2, 3), np.float32)
        splat(intr_h, h2, w2, colors, img_h)
        imgs[i] = np.repeat(np.repeat(img_h, 2, axis=0), 2, axis=1)
        splat(intr_h, h2, w2, z, deps[i])
    valid = (deps > 0).astype(np.float32)
    return imgs, deps, valid, w2c, np.asarray(intr_h, np.float32)


def protocol_rmse(t_est: np.ndarray, rot: np.ndarray, trans: np.ndarray,
                  src: np.ndarray) -> float:
    """RMSE between the estimated and GT transforms applied to the source
    points — the quantity the 3DMatch recall criterion thresholds at 0.2 m
    (covariance-weighted form, lib/benchmark.py:213-243; with dense point
    support the unweighted RMSE is the same quantity)."""
    gt = src @ rot.T + trans
    est = src @ t_est[:3, :3].T + t_est[:3, 3]
    return float(np.sqrt(np.mean(np.sum((gt - est) ** 2, axis=1))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--eval-every", type=int, default=250)
    ap.add_argument("--budget", type=int, default=26624)
    ap.add_argument("--lr", type=float, default=0.005)
    ap.add_argument("--optimizer", default="SGD", choices=["SGD", "Adam"],
                    help="Adam converges far faster from scratch; SGD matches "
                         "the reference schedule")
    ap.add_argument("--out", default="perf_runs/accuracy_evidence.jsonl")
    ap.add_argument("--n-eval", type=int, default=4)
    ap.add_argument("--n-points", type=int, default=5000)
    ap.add_argument("--max-rot-deg", type=float, default=45.0,
                    help="180 = full SO(3) relative poses (random axis, "
                         "uniform angle) — the reference's training regime")
    ap.add_argument("--resample-frac", type=float, default=1.0,
                    help="independently subsample each crop to this fraction "
                         "so overlap points are not 1:1 identical (simulates "
                         "two distinct scans of one surface)")
    ap.add_argument("--seed", type=int, default=7, help="training-stream seed")
    ap.add_argument("--rot-curriculum", type=int, default=0, metavar="STEPS",
                    help="ramp the TRAINING rotation cap linearly from 30° "
                         "to --max-rot-deg over this many steps (0 = off). "
                         "Held-out eval pairs always use the full cap — the "
                         "curriculum only schedules training difficulty, the "
                         "way the reference's 150-epoch schedule amortizes "
                         "full-2π augmentation (datasets/indoor.py:151-156)")
    ap.add_argument("--saliency-after", type=int, default=10**9,
                    help="enable the saliency loss after this step (the "
                         "reference gates it on recall>0.3, trainer.py:417-420)")
    ap.add_argument("--images", action="store_true",
                    help="train the FULL color+geometry PCRCG: render "
                         "img_num geometry-consistent views per cloud "
                         "(procedural surface colors) and lift 2D features "
                         "through the ResNet50-UNet ahead of KPFCNN")
    ap.add_argument("--img-size", type=int, nargs=2, default=(240, 320),
                    metavar=("H", "W"))
    ap.add_argument("--search-exact", action="store_true",
                    help="exact per-row top-k in the tiled neighbor search "
                         "plus full m_tiles (no pruning approximation) — the "
                         "reference's exact sorted neighbor lists "
                         "(cpp_neighbors/neighbors.cpp:266); for bounding the "
                         "approximation stack end-to-end (VERDICT r3 item 8)")
    ap.add_argument("--decay-epochs", type=int, default=150,
                    help="spread this many x0.95 lr decays over the run "
                         "(reference schedule = 150).  At 150, lr falls "
                         "below 1e-4 by ~step/5 and the rest of the run is "
                         "frozen — the round-4 SO(3) curves were flat past "
                         "step ~3000 for exactly this reason; 50 keeps "
                         "learning alive to the end (final lr ~7.7e-5 from "
                         "1e-3)")
    ap.add_argument("--recall-target", default="",
                    help="override budgets.search_recall_target: scalar or "
                         "per-level comma list (e.g. 0.9 or 0.9,0.95) — for "
                         "end-task A/B of the approx top-k ladder")
    ap.add_argument("--save-params", default="",
                    help="serialize final train-state variables to this file "
                         "(flax msgpack) so later sessions can eval the same "
                         "weights under different search stacks or resume")
    ap.add_argument("--init-params", default="",
                    help="initialize variables from a --save-params file")
    ap.add_argument("--eval-only", action="store_true",
                    help="skip training: evaluate --init-params on the "
                         "held-out pairs and emit a single final event")
    ap.add_argument("--pair-pool", type=int, default=0,
                    help="pre-generate this many training samples and cycle "
                         "them (shuffled) instead of synthesizing per step — "
                         "keeps the 1-CPU host's render cost off the step "
                         "path in --images runs (0 = fresh sample per step)")
    args = ap.parse_args()

    from pcrcg_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    import jax

    # The axon TPU plugin ignores the JAX_PLATFORMS env var; honor it
    # explicitly so CPU runs don't steal the chip from a concurrent job.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from bench import load_assets_pair
    from pcrcg_tpu.config import Budgets, Config
    from pcrcg_tpu.data.pair import make_pair_batch
    from pcrcg_tpu.models.kpfcnn import KPFCNN
    from pcrcg_tpu.ops.pyramid import build_pyramid
    from pcrcg_tpu.registration.ransac import feature_correspondences, ransac_pose
    from pcrcg_tpu.registration.sampling import weighted_sample_topk
    from pcrcg_tpu.train.state import create_train_state
    from pcrcg_tpu.train.step import train_step

    budgets = Budgets(
        points=(args.budget, args.budget // 3 + 64, args.budget // 10 + 64,
                args.budget // 32 + 64),
    )
    if args.search_exact:
        import dataclasses

        budgets = dataclasses.replace(budgets, search_exact=True, search_m_tiles=24)
    if args.recall_target:
        import dataclasses

        raw = args.recall_target
        rt = (
            tuple(float(v) for v in raw.split(","))
            if "," in raw else float(raw)
        )
        budgets = dataclasses.replace(budgets, search_recall_target=rt)
    cfg = Config(budgets=budgets, lr=args.lr, w_saliency_loss=0.0,
                 optimizer=args.optimizer)
    if args.images:
        cfg = cfg.replace(image_feature=True, in_feats_dim=129)
    cfg_sal = cfg.replace(w_saliency_loss=1.0)
    clouds = list(load_assets_pair())
    rng = np.random.default_rng(args.seed)
    ih, iw = args.img_size

    def sample_batch(r, rot_cap=None):
        cloud = clouds[int(r.integers(0, len(clouds)))]
        src, tgt, rot, trans, src0, tgt0 = make_synthetic_pair(
            cloud, r,
            max_rot_deg=rot_cap if rot_cap is not None else args.max_rot_deg,
            resample_frac=args.resample_frac,
        )
        batch = make_pair_batch(
            [dict(src_pcd=src, tgt_pcd=tgt, rot=rot, trans=trans)],
            cfg.budgets.points[0],
        )
        images = None
        if args.images:
            import jax.numpy as _jnp

            stacks = [
                render_views(pts, procedural_colors(orig), cfg.img_num, r,
                             height=ih, width=iw)
                for pts, orig in ((src, src0), (tgt, tgt0))
            ]
            images = {
                "colors": _jnp.asarray(np.stack([s[0] for s in stacks])),
                "depths": _jnp.asarray(np.stack([s[1] for s in stacks])),
                "valid_maps": _jnp.asarray(np.stack([s[2] for s in stacks])),
                "world2cam": _jnp.asarray(np.stack([s[3] for s in stacks])),
                "intrinsics": _jnp.asarray(stacks[0][4]),
            }
        return batch, images, (src, tgt, rot, trans)

    # Held-out evaluation pairs: one independent generator PER PAIR so the
    # pair geometry is identical across run modes (--images consumes extra
    # draws for view rendering; a shared sequential generator would shift
    # every later pair and break images-vs-geometry comparability).
    eval_pairs = [
        sample_batch(np.random.default_rng(12345 + 1000 * i))
        for i in range(args.n_eval)
    ]
    # Per-pair GT overlap fraction at the reference's overlap_radius
    # (0.0375 m, configs/train/indoor.yaml) — the 3DMatch protocol computes
    # recall over >0.3-overlap pairs only; 0.1-0.3 is the separate
    # 3DLoMatch tier.  The band-crop generator does not enforce a minimum,
    # so record the regime of every eval pair for protocol-faithful
    # reporting.
    from scipy.spatial import cKDTree

    eval_overlap = []
    for _, _, (src, tgt, rot, trans) in eval_pairs:
        tgt_back = (tgt - trans) @ rot
        d, _ = cKDTree(tgt_back).query(src, k=1)
        eval_overlap.append(round(float((d < 0.0375).mean()), 4))

    if args.images:
        from pcrcg_tpu.models.pcrcg import PCRCG

        model = PCRCG(cfg)
    else:
        model = KPFCNN(cfg)
    batch0, images0, _ = sample_batch(np.random.default_rng(0))
    pyr0 = build_pyramid(
        batch0.points[0], batch0.masks[0], cfg.budgets, cfg.first_subsampling_dl,
        cfg.conv_radius,
    )
    if args.images:
        variables = jax.jit(model.init)(
            jax.random.key(cfg.seed), pyr0, batch0.features[0], images0
        )
    else:
        variables = jax.jit(model.init)(jax.random.key(cfg.seed), pyr0, batch0.features[0])
    if args.init_params:
        from flax import serialization

        with open(args.init_params, "rb") as f:
            variables = serialization.from_bytes(variables, f.read())
    # Spread the reference's 150 per-epoch decays over this run — the
    # default steps_per_epoch=1 would decay lr x0.95 EVERY STEP and freeze
    # training by step ~200.
    state = create_train_state(
        cfg, variables, steps_per_epoch=max(1, args.steps // args.decay_epochs)
    )

    @jax.jit
    def register_pair(variables, points, masks, features, key, images=None):
        pyr = build_pyramid(
            points, masks, cfg.budgets, cfg.first_subsampling_dl, cfg.conv_radius
        )
        if args.images:
            out = model.apply(variables, pyr, features, images)
        else:
            out = model.apply(variables, pyr, features)
        k1, k2, k3 = jax.random.split(key, 3)
        scores = out["scores_overlap"] * out["scores_saliency"]
        src_idx, src_ok = weighted_sample_topk(k1, scores[0], masks[0], args.n_points)
        tgt_idx, tgt_ok = weighted_sample_topk(k2, scores[1], masks[1], args.n_points)
        s_pts, s_feats = points[0][src_idx], out["feats_f"][0][src_idx]
        t_pts, t_feats = points[1][tgt_idx], out["feats_f"][1][tgt_idx]
        corr, valid = feature_correspondences(s_feats, t_feats, src_ok, tgt_ok)
        res = ransac_pose(
            k3, s_pts, t_pts, corr, valid,
            distance_threshold=0.05, ransac_n=3, num_iterations=50000,
            hypothesis_chunk=1024,
        )
        return res.transform, res.fitness

    def evaluate(state, step):
        rmses, fits = [], []
        for i, (batch, images, (src, tgt, rot, trans)) in enumerate(eval_pairs):
            t_est, fit = register_pair(
                state.variables(), batch.points[0], batch.masks[0],
                batch.features[0], jax.random.key(1000 + i), images,
            )
            t_est = np.asarray(t_est)
            rmses.append(protocol_rmse(t_est, rot, trans, src))
            fits.append(float(fit))
        recall = float(np.mean([r <= 0.2 for r in rmses]))
        # Protocol split: 3DMatch counts >0.3-overlap pairs only (the
        # 0.1-0.3 tier is 3DLoMatch) — report the protocol-regime recall
        # alongside the all-pairs number.
        hi = [r for r, o in zip(rmses, eval_overlap) if o > 0.3]
        rec = dict(step=step, rmse=[round(r, 4) for r in rmses],
                   fitness=[round(f, 4) for f in fits], recall=recall)
        if hi:
            rec["recall_3dmatch"] = float(np.mean([r <= 0.2 for r in hi]))
        return rec

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    log = open(args.out, "a")

    def emit(rec):
        rec["t"] = round(time.time(), 1)
        log.write(json.dumps(rec) + "\n")
        log.flush()
        print(json.dumps(rec), flush=True)

    emit(dict(
        event="start", steps=args.steps, budget=args.budget, lr=args.lr,
        max_rot_deg=args.max_rot_deg, n_eval=args.n_eval,
        resample_frac=args.resample_frac, images=bool(args.images),
        optimizer=args.optimizer, pair_pool=args.pair_pool, seed=args.seed,
        eval_overlap=eval_overlap, search_exact=bool(args.search_exact),
    ))
    if args.eval_only:
        final = evaluate(state, 0)
        emit(dict(event="final", **final))
        print(f"EVAL-ONLY: recall {final['recall']:.4f}", flush=True)
        return

    emit(dict(event="eval", **evaluate(state, 0)))

    def train_rot_cap(step):
        if not args.rot_curriculum:
            return args.max_rot_deg
        frac = min(1.0, step / args.rot_curriculum)
        return 30.0 + (args.max_rot_deg - 30.0) * frac

    pool = None
    if args.pair_pool:
        # With a curriculum the pool is generated in ascending-difficulty
        # order; training draws from the prefix allowed at the current step.
        if args.rot_curriculum:
            caps = [30.0 + (args.max_rot_deg - 30.0) * i / max(args.pair_pool - 1, 1)
                    for i in range(args.pair_pool)]
        else:
            caps = [None] * args.pair_pool
        # One independent generator PER POOL ENTRY (same reason as the eval
        # pairs): --images consumes extra draws per sample for view
        # rendering, so a shared sequential generator would give the
        # geometry-only and --images runs different training pools and
        # break the same-pool comparison.
        pool = [
            sample_batch(np.random.default_rng(777_000 + args.seed * 10_000 + i), cap)
            for i, cap in enumerate(caps)
        ]

    key = jax.random.key(999)
    t0 = time.perf_counter()
    for step in range(1, args.steps + 1):
        if pool is not None:
            if args.rot_curriculum:
                frac = min(1.0, step / args.rot_curriculum)
                hi = max(8, int(len(pool) * frac))
                batch, images, _ = pool[int(rng.integers(0, min(hi, len(pool))))]
            else:
                batch, images, _ = pool[int(rng.integers(0, len(pool)))]
        else:
            batch, images, _ = sample_batch(rng, train_rot_cap(step))
        step_cfg = cfg_sal if step >= args.saliency_after else cfg
        state, stats = train_step(
            model, step_cfg, state, batch, jax.random.fold_in(key, step),
            jax.tree_util.tree_map(lambda x: x[None], images) if images else None,
        )
        if step % 50 == 0:
            emit(dict(
                event="train", step=step,
                total=round(float(stats["total"]), 4),
                circle=round(float(stats.get("circle_loss", jnp.nan)), 4),
                recall=round(float(stats.get("recall", jnp.nan)), 4),
                sec_per_step=round((time.perf_counter() - t0) / step, 3),
            ))
        if step % args.eval_every == 0:
            emit(dict(event="eval", **evaluate(state, step)))

    final = evaluate(state, args.steps)
    emit(dict(event="final", **final))
    if args.save_params:
        from flax import serialization

        os.makedirs(os.path.dirname(args.save_params) or ".", exist_ok=True)
        with open(args.save_params, "wb") as f:
            f.write(serialization.to_bytes(state.variables()))
    ok = final["recall"] == 1.0
    print(f"ACCURACY EVIDENCE {'PASS' if ok else 'PARTIAL'}: "
          f"registration recall {final['recall']:.2f} at protocol RMSE<=0.2", flush=True)


if __name__ == "__main__":
    main()
