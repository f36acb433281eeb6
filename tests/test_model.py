"""KPFCNN end-to-end forward: shapes, finiteness, architecture bookkeeping,
and pad-budget invariance (same real points, bigger pads -> same outputs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcrcg_tpu.config import Budgets, tiny_test_config
from pcrcg_tpu.models.kpfcnn import KPFCNN, plan_architecture
from pcrcg_tpu.ops.masked import PAD_COORD
from pcrcg_tpu.ops.pyramid import build_pyramid


def make_pair(rng, n_src, n_tgt, budget):
    pts = np.full((2, budget, 3), PAD_COORD, np.float32)
    mask = np.zeros((2, budget), bool)
    pts[0, :n_src] = rng.uniform(0, 0.5, size=(n_src, 3))
    pts[1, :n_tgt] = rng.uniform(0, 0.5, size=(n_tgt, 3))
    mask[0, :n_src] = True
    mask[1, :n_tgt] = True
    return jnp.asarray(pts), jnp.asarray(mask)


def test_plan_matches_reference_bookkeeping():
    cfg = tiny_test_config(first_feats_dim=256, gnn_feats_dim=512, final_feats_dim=32)
    plan = plan_architecture(cfg)
    assert len(plan.encoder) == 11
    assert plan.encoder_skips[:3] == (2, 5, 8)
    assert plan.bottleneck_dim == 2048
    dims = [(b.kind, b.in_dim, b.out_dim) for b in plan.decoder]
    assert dims == [
        ("upsample", 514, 514),
        ("unary", 514 + 1024, 257),
        ("upsample", 257, 257),
        ("unary", 257 + 512, 128),
        ("upsample", 128, 128),
        ("last_unary", 128 + 256, 34),
    ]
    assert plan.decoder_concats == (1, 3, 5)
    # Radii double per level; decoder walks back down.
    assert plan.encoder[0].radius == pytest.approx(0.0625)
    assert plan.encoder[-1].radius == pytest.approx(0.5)


@pytest.fixture(scope="module")
def tiny_forward():
    cfg = tiny_test_config()
    rng = np.random.default_rng(3)
    pts, mask = make_pair(rng, 180, 150, cfg.budgets.points[0])
    pyr = build_pyramid(pts, mask, cfg.budgets, cfg.first_subsampling_dl, cfg.conv_radius)
    feats = jnp.where(mask[..., None], 1.0, 0.0)
    model = KPFCNN(cfg)
    variables = model.init(jax.random.key(0), pyr, feats)
    out = model.apply(variables, pyr, feats)
    return cfg, pts, mask, pyr, feats, model, variables, out


def test_forward_shapes_and_finiteness(tiny_forward):
    cfg, pts, mask, pyr, feats, model, variables, out = tiny_forward
    n0 = cfg.budgets.points[0]
    assert out["feats_f"].shape == (2, n0, cfg.final_feats_dim)
    assert out["scores_overlap"].shape == (2, n0)
    assert out["scores_saliency"].shape == (2, n0)
    for v in out.values():
        assert np.all(np.isfinite(np.asarray(v)))
    # Descriptors are unit-norm on real rows.
    norms = np.linalg.norm(np.asarray(out["feats_f"]), axis=-1)
    np.testing.assert_allclose(norms[np.asarray(mask)], 1.0, atol=1e-4)
    s = np.asarray(out["scores_overlap"])
    assert (s >= 0).all() and (s <= 1).all()


def test_pad_budget_invariance(tiny_forward):
    """Growing every pad budget must not change outputs on real rows."""
    cfg, pts, mask, pyr, feats, model, variables, out = tiny_forward
    big = Budgets(points=(320, 256, 256, 128), neighbors=(16, 16, 16, 16),
                  corr_k=8, query_chunk=64)
    cfg2 = cfg.replace(budgets=big)
    pts2 = jnp.full((2, 320, 3), PAD_COORD, jnp.float32).at[:, :256].set(pts)
    mask2 = jnp.zeros((2, 320), bool).at[:, :256].set(mask)
    pyr2 = build_pyramid(pts2, mask2, big, cfg2.first_subsampling_dl, cfg2.conv_radius)
    feats2 = jnp.where(mask2[..., None], 1.0, 0.0)
    out2 = KPFCNN(cfg2).apply(variables, pyr2, feats2)

    m = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(out2["feats_f"])[:, :256][m], np.asarray(out["feats_f"])[m],
        rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out2["scores_overlap"])[:, :256][m],
        np.asarray(out["scores_overlap"])[m], rtol=1e-3, atol=1e-4,
    )


def test_gradients_flow(tiny_forward):
    cfg, pts, mask, pyr, feats, model, variables, out = tiny_forward

    def loss_fn(params):
        res = model.apply(
            {"params": params, "constants": variables["constants"]}, pyr, feats
        )
        m = mask[..., None]
        return jnp.sum(jnp.where(m, res["feats_f"], 0.0) ** 2) + jnp.sum(
            jnp.where(mask, res["scores_overlap"], 0.0)
        )

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert total > 0.0


def test_bfloat16_compute_close_to_f32(tiny_forward):
    cfg, pts, mask, pyr, feats, model, variables, out = tiny_forward
    cfg16 = cfg.replace(compute_dtype="bfloat16")
    out16 = KPFCNN(cfg16).apply(variables, pyr, feats)
    m = np.asarray(mask)
    # Descriptors stay unit-norm and close; scores close in absolute terms.
    d = np.abs(np.asarray(out16["feats_f"])[m] - np.asarray(out["feats_f"])[m])
    assert np.median(d) < 0.05
    s = np.abs(
        np.asarray(out16["scores_overlap"])[m] - np.asarray(out["scores_overlap"])[m]
    )
    assert np.median(s) < 0.05


def test_deformable_architecture_forward_and_grads(rng):
    """deformable: True swaps resnetb blocks for deformable variants
    (reference blocks.py:235-316 semantics): forward is finite, offsets get
    gradients, and the pyramid widens deformable search radii
    (dataloader.py:266-299)."""
    from pcrcg_tpu.ops.pyramid import build_pyramid_cfg

    cfg = tiny_test_config(deformable=True, modulated=True)
    assert any("deformable" in b for b in cfg.architecture)
    conv_f, pool_f = cfg.deform_level_flags()
    assert pool_f == (True, True, True) and conv_f[1:] == (True, True, True)

    pts, mask = make_pair(rng, 96, 80, cfg.budgets.points[0])
    pyr = build_pyramid_cfg(cfg, pts, mask)
    feats = jnp.ones((2, cfg.budgets.points[0], 1), jnp.float32)
    model = KPFCNN(cfg)
    variables = model.init(jax.random.key(0), pyr, feats)

    # offset_conv params + biases exist on every deformable block
    enc1 = variables["params"]["encoder_1"]["KPConv"]
    assert "offset_conv" in enc1 and "offset_bias" in enc1

    out = model.apply(variables, pyr, feats)
    assert np.isfinite(np.asarray(out["feats_f"])).all()

    def loss_fn(params):
        o = model.apply({**variables, "params": params}, pyr, feats)
        return jnp.sum(o["feats_f"] ** 2) + jnp.sum(o["scores_overlap"])

    grads = jax.grad(loss_fn)(variables["params"])
    g = grads["encoder_1"]["KPConv"]["offset_conv"]["weights"]
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0.0


def test_deformable_pyramid_radius_widening(rng):
    """Deformable pool searches run at deform_radius/conv_radius x the rigid
    radius: the widened search must find strictly more neighbors for a
    point ring placed between the two radii."""
    from pcrcg_tpu.ops.pyramid import build_pyramid_cfg

    rigid = tiny_test_config()
    deform = tiny_test_config(deformable=True)
    pts, mask = make_pair(rng, 128, 128, rigid.budgets.points[0])
    pyr_r = build_pyramid_cfg(rigid, pts, mask)
    pyr_d = build_pyramid_cfg(deform, pts, mask)
    n0 = rigid.budgets.points[1]
    real_r = (pyr_r.pools[0] < pyr_r.points[0].shape[1]).sum()
    real_d = (pyr_d.pools[0] < pyr_d.points[0].shape[1]).sum()
    assert int(real_d) > int(real_r)
