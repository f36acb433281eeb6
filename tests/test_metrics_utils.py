"""Tests: inlier-ratio/mutual-selection metrics, timers, logging."""
import json
import os

import jax.numpy as jnp
import numpy as np

from pcrcg_tpu.eval.metrics import inlier_ratio, mutual_selection
from pcrcg_tpu.utils.logging import Logger
from pcrcg_tpu.utils.timer import AverageMeter, Timer


def test_mutual_selection_matches_loop_oracle(rng):
    scores = rng.normal(size=(2, 10, 12)).astype(np.float32)
    got = np.asarray(mutual_selection(jnp.asarray(scores)))
    for b in range(2):
        for i in range(10):
            for j in range(12):
                want = scores[b, i].argmax() == j and scores[b, :, j].argmax() == i
                assert got[b, i, j] == want


def test_inlier_ratio_perfect_and_padded(rng):
    n = 50
    pts = rng.uniform(size=(n, 3)).astype(np.float32)
    feats = rng.normal(size=(n, 8)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    mask = np.ones(n, bool)
    res = inlier_ratio(
        jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(feats),
        jnp.eye(3), jnp.zeros(3), jnp.asarray(mask), jnp.asarray(mask),
    )
    assert float(res["inlier_ratio_wo_mutual"]) == 1.0
    assert float(res["inlier_ratio_w_mutual"]) == 1.0

    # Pads must not contribute.
    pad = np.zeros((10, 3), np.float32)
    pts2 = np.concatenate([pts, pad])
    feats2 = np.concatenate([feats, np.zeros((10, 8), np.float32)])
    mask2 = np.concatenate([mask, np.zeros(10, bool)])
    res2 = inlier_ratio(
        jnp.asarray(pts2), jnp.asarray(pts2), jnp.asarray(feats2), jnp.asarray(feats2),
        jnp.eye(3), jnp.zeros(3), jnp.asarray(mask2), jnp.asarray(mask2),
    )
    assert float(res2["inlier_ratio_wo_mutual"]) == 1.0


def test_timer_and_meter():
    m = AverageMeter()
    for v in (1.0, 2.0, 3.0):
        m.update(v)
    assert m.avg == 2.0 and m.count == 3 and m.val == 3.0
    t = Timer()
    with t:
        pass
    assert t.calls == 1 and t.diff >= 0


def test_logger_writes_scalars(tmp_path):
    log = Logger(str(tmp_path))
    log.write("hello\n")
    log.scalars("train", {"loss": 1.5}, step=3)
    log.close()
    assert "hello" in open(tmp_path / "log").read()
    rec = json.loads(open(tmp_path / "scalars.jsonl").read().splitlines()[0])
    assert rec["loss"] == 1.5 and rec["step"] == 3
