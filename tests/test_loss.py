"""Loss tests: weighted BCE and circle loss vs numpy oracles replicating
reference lib/loss.py semantics, plus end-to-end metric_loss sanity."""
import jax
import jax.numpy as jnp
import numpy as np

from pcrcg_tpu.config import tiny_test_config
from pcrcg_tpu.losses import LossInputs, circle_loss_and_recall, metric_loss, weighted_bce
from pcrcg_tpu.ops.masked import PAD_COORD


def oracle_weighted_bce(pred, gt):
    eps = 1e-12
    ce = -(gt * np.log(pred + eps) + (1 - gt) * np.log(1 - pred + eps))
    w_neg = gt.sum() / gt.size
    w_pos = 1 - w_neg
    weights = np.where(gt >= 0.5, w_pos, w_neg)
    return np.mean(weights * ce)


def test_weighted_bce_matches_oracle(rng):
    pred = rng.uniform(0.02, 0.98, size=40).astype(np.float32)
    gt = (rng.uniform(size=40) > 0.7).astype(np.float32)
    want = oracle_weighted_bce(pred, gt)
    got, _, _ = weighted_bce(jnp.asarray(pred), jnp.asarray(gt), jnp.ones(40, bool))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)
    # Padding invariance: appending invalid entries must not change it.
    got2, _, _ = weighted_bce(
        jnp.concatenate([jnp.asarray(pred), jnp.zeros(13)]),
        jnp.concatenate([jnp.asarray(gt), jnp.ones(13)]),
        jnp.concatenate([jnp.ones(40, bool), jnp.zeros(13, bool)]),
    )
    np.testing.assert_allclose(float(got2), want, rtol=1e-5)


def oracle_circle(coords_dist, feats_dist, cfg, log_scale=16.0):
    pos_mask = coords_dist < cfg.pos_radius
    neg_mask = coords_dist > cfg.safe_radius
    row_sel = (pos_mask.sum(-1) > 0) & (neg_mask.sum(-1) > 0)
    col_sel = (pos_mask.sum(-2) > 0) & (neg_mask.sum(-2) > 0)
    pos_w = np.maximum(feats_dist - 1e5 * (~pos_mask) - 0.1, 0)
    neg_w = np.maximum(1.4 - (feats_dist + 1e5 * (~neg_mask)), 0)

    def lse(x, axis):
        mx = x.max(axis=axis, keepdims=True)
        return (mx + np.log(np.exp(x - mx).sum(axis=axis, keepdims=True))).squeeze(axis)

    lpr = lse(log_scale * (feats_dist - cfg.pos_margin) * pos_w, -1)
    lpc = lse(log_scale * (feats_dist - cfg.pos_margin) * pos_w, -2)
    lnr = lse(log_scale * (cfg.neg_margin - feats_dist) * neg_w, -1)
    lnc = lse(log_scale * (cfg.neg_margin - feats_dist) * neg_w, -2)
    sp = lambda v: np.log1p(np.exp(-np.abs(v))) + np.maximum(v, 0)
    lr = sp(lpr + lnr) / log_scale
    lc = sp(lpc + lnc) / log_scale
    return (lr[row_sel].mean() + lc[col_sel].mean()) / 2


def test_circle_loss_matches_oracle(rng):
    cfg = tiny_test_config()
    p = 24
    coords = rng.uniform(0, 0.3, size=(p, p)).astype(np.float32)
    np.fill_diagonal(coords, 0.01)  # ensure positives
    feats = rng.uniform(0, 1.4, size=(p, p)).astype(np.float32)
    want = oracle_circle(coords, feats, cfg)
    got, _ = circle_loss_and_recall(
        jnp.asarray(coords), jnp.asarray(feats), jnp.ones(p, bool), cfg
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-4)

    # Pad invariance: extra invalid pairs change nothing.
    p2 = p + 9
    coords2 = np.full((p2, p2), 0.07, np.float32)
    feats2 = np.zeros((p2, p2), np.float32)
    coords2[:p, :p] = coords
    feats2[:p, :p] = feats
    valid = np.zeros(p2, bool)
    valid[:p] = True
    got2, _ = circle_loss_and_recall(
        jnp.asarray(coords2), jnp.asarray(feats2), jnp.asarray(valid), cfg
    )
    np.testing.assert_allclose(float(got2), want, rtol=1e-4)


def test_metric_loss_end_to_end(rng):
    cfg = tiny_test_config()
    n = cfg.budgets.points[0]
    n_src, n_tgt = 150, 130
    src = np.full((n, 3), PAD_COORD, np.float32)
    tgt = np.full((n, 3), PAD_COORD, np.float32)
    base = rng.uniform(0, 0.8, size=(200, 3)).astype(np.float32)
    src[:n_src] = base[:n_src]
    # tgt = overlapping subset of src, slightly perturbed, then inverse-rotated
    from pcrcg_tpu.geom import so3

    rot = so3.random_rotation(rng)
    overlap = base[50 : 50 + n_tgt] + rng.normal(scale=0.002, size=(n_tgt, 3))
    tgt[:n_tgt] = overlap.astype(np.float32)
    # GT: rot @ src + trans ≈ tgt  =>  use identity here but rotate src first
    src[:n_src] = (base[:n_src] @ rot.T).astype(np.float32)  # src is rotated version
    src_mask = np.zeros(n, bool)
    src_mask[:n_src] = True
    tgt_mask = np.zeros(n, bool)
    tgt_mask[:n_tgt] = True

    c = cfg.final_feats_dim
    f = rng.normal(size=(2, n, c)).astype(np.float32)
    f /= np.linalg.norm(f, axis=-1, keepdims=True)

    inputs = LossInputs(
        src_pcd=jnp.asarray(src),
        tgt_pcd=jnp.asarray(tgt),
        src_mask=jnp.asarray(src_mask),
        tgt_mask=jnp.asarray(tgt_mask),
        rot=jnp.asarray(rot.T),  # undo the rotation: rot.T @ src = base
        trans=jnp.zeros(3),
        src_feats=jnp.asarray(f[0]),
        tgt_feats=jnp.asarray(f[1]),
        scores_overlap=jnp.full(2 * n, 0.5),
        scores_saliency=jnp.full(2 * n, 0.5),
    )
    stats = jax.jit(lambda i, k: metric_loss(i, cfg, k))(inputs, jax.random.key(0))
    for k, v in stats.items():
        assert np.isfinite(float(v)), k
    assert float(stats["circle_loss"]) > 0
    assert float(stats["overlap_loss"]) > 0
    assert 0 <= float(stats["recall"]) <= 1
    assert float(stats["total"]) == float(
        stats["circle_loss"] + stats["overlap_loss"] + stats["saliency_loss"]
    )
