"""Train-step smoke tests: a few optimizer steps on a tiny synthetic pair
must run under jit, keep finite params, and reduce the loss; the NaN gate
must skip poisoned gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcrcg_tpu.config import tiny_test_config
from pcrcg_tpu.data.pair import make_pair_batch
from pcrcg_tpu.geom import so3
from pcrcg_tpu.models.kpfcnn import KPFCNN
from pcrcg_tpu.ops.pyramid import build_pyramid
from pcrcg_tpu.train.state import create_train_state
from pcrcg_tpu.train.step import eval_step, infer_step, train_step


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config(lr=0.05)
    rng = np.random.default_rng(7)
    base = rng.uniform(0, 0.5, size=(160, 3)).astype(np.float32)
    rot = so3.random_rotation(rng)
    trans = rng.normal(scale=0.1, size=3).astype(np.float32)
    src = (base - trans) @ rot  # so that rot @ src + trans = base
    sample = {
        "src_pcd": src,
        "tgt_pcd": base[20:150] + rng.normal(scale=0.002, size=(130, 3)).astype(np.float32),
        "rot": rot,
        "trans": trans,
    }
    batch = make_pair_batch([sample], cfg.budgets.points[0])

    model = KPFCNN(cfg)
    pyr = build_pyramid(
        batch.points[0], batch.masks[0], cfg.budgets, cfg.first_subsampling_dl, cfg.conv_radius
    )
    variables = model.init(jax.random.key(0), pyr, batch.features[0])
    state = create_train_state(cfg, variables, steps_per_epoch=10)
    return cfg, model, state, batch


def test_train_step_reduces_loss(setup):
    cfg, model, state, batch = setup
    key = jax.random.key(1)
    first = None
    for i in range(5):
        key, sub = jax.random.split(key)
        state, stats = train_step(model, cfg, state, batch, sub)
        total = float(stats["total"])
        assert np.isfinite(total)
        if first is None:
            first = total
    assert total < first, (first, total)
    assert int(state.step) == 5


def test_overflow_stat_surfaces_budget_drop(setup):
    """stats['max_overflow'] (VERDICT r4 item 7): zero on an in-budget
    pair; positive when the level-1 voxel budget is too small for the
    cloud (voxels silently dropped by the OOB scatter)."""
    cfg, model, state, batch = setup
    stats = eval_step(model, cfg, state, batch, jax.random.key(3))
    assert float(stats["max_overflow"]) == 0.0

    # Squeeze level 1: the 160-point cloud occupies ~148 voxels at
    # dl=2*0.025, far over a 32-point budget (but keep every level >=
    # the k=16 neighbor cap so the searches stay well-formed).
    import dataclasses

    tight = cfg.replace(
        budgets=dataclasses.replace(cfg.budgets, points=(256, 32, 32, 32))
    )
    stats2 = eval_step(model, tight, state, batch, jax.random.key(3))
    assert float(stats2["max_overflow"]) > 0.0


def test_eval_and_infer_steps(setup):
    cfg, model, state, batch = setup
    stats = eval_step(model, cfg, state, batch, jax.random.key(2))
    assert np.isfinite(float(stats["total"]))
    out = infer_step(model, cfg, state, batch)
    assert out["feats_f"].shape == (1, 2, cfg.budgets.points[0], cfg.final_feats_dim)


def test_nan_gate_skips_bad_grads(setup):
    cfg, model, state, batch = setup
    # Poison the GT rotation so the loss produces NaNs -> grads non-finite.
    # (Features can't be the poison carrier: with in_feats_dim == 1 the
    # ones-column fast path ignores feature VALUES by design.)
    bad = batch.replace(rot=batch.rot * jnp.nan)
    params_before = jax.tree_util.tree_leaves(state.params)[0].copy()
    new_state, stats = train_step(model, cfg, state, bad, jax.random.key(3))
    params_after = jax.tree_util.tree_leaves(new_state.params)[0]
    np.testing.assert_array_equal(np.asarray(params_before), np.asarray(params_after))


def test_aux_heads_train_step(setup):
    """node_overlap and quaternion heads participate in the loss."""
    cfg, model, state, batch = setup
    cfg2 = cfg.replace(node_overlap=True, quaternion=True)
    from pcrcg_tpu.models.kpfcnn import KPFCNN
    from pcrcg_tpu.ops.pyramid import build_pyramid
    from pcrcg_tpu.train.state import create_train_state

    model2 = KPFCNN(cfg2)
    pyr = build_pyramid(
        batch.points[0], batch.masks[0], cfg2.budgets,
        cfg2.first_subsampling_dl, cfg2.conv_radius,
    )
    variables = model2.init(jax.random.key(0), pyr, batch.features[0])
    state2 = create_train_state(cfg2, variables)
    state2, stats = train_step(model2, cfg2, state2, batch, jax.random.key(5))
    for key in ("node_overlap_loss", "pose_loss", "total"):
        assert np.isfinite(float(stats[key])), key
    assert float(stats["total"]) == pytest.approx(
        float(
            stats["circle_loss"] + stats["overlap_loss"] + stats["saliency_loss"]
            + stats["node_overlap_loss"] + stats["pose_loss"]
        ),
        rel=1e-5,
    )


@pytest.mark.slow
def test_train_step_with_images():
    """The FLAGSHIP color+geometry model (PCRCG: ResNet50-UNet lift ahead
    of KPFCNN) must run a full train step — forward through the 2D
    backbone + lift, loss, backward (backbone detached), update — with
    finite loss and params."""
    from bench import synthetic_images
    from pcrcg_tpu.models.pcrcg import PCRCG

    # weight_decay deliberately HUGE: if the optimizer saw the frozen
    # backbone, add_decayed_weights would shift every param by lr·wd·p =
    # 1e-3·p per step — far above f32 ulp, so the bit-identity assertion
    # below actually proves the optax.multi_transform freeze (the reference
    # never optimizes backbone2d, main.py:59 + lib/trainer.py:49-70).
    cfg = tiny_test_config(image_feature=True, in_feats_dim=129, lr=0.01, weight_decay=0.1)
    rng = np.random.default_rng(11)
    base = rng.uniform(0, 0.5, size=(160, 3)).astype(np.float32)
    sample = {
        "src_pcd": base,
        "tgt_pcd": base[20:150] + rng.normal(scale=0.002, size=(130, 3)).astype(np.float32),
        "rot": np.eye(3),
        "trans": np.zeros(3),
    }
    batch = make_pair_batch([sample], cfg.budgets.points[0])
    images = {
        k: jnp.asarray(v)
        for k, v in synthetic_images(cfg.img_num, height=32, width=40).items()
    }

    model = PCRCG(cfg)
    pyr = build_pyramid(
        batch.points[0], batch.masks[0], cfg.budgets, cfg.first_subsampling_dl, cfg.conv_radius
    )
    variables = model.init(jax.random.key(0), pyr, batch.features[0], images)
    state = create_train_state(cfg, variables, steps_per_epoch=10)

    batched_images = jax.tree_util.tree_map(lambda x: x[None], images)
    new_state, stats = train_step(
        model, cfg, state, batch, jax.random.key(1), batched_images
    )
    assert np.isfinite(float(stats["total"]))
    for leaf in jax.tree_util.tree_leaves(new_state.params):
        assert np.isfinite(np.asarray(leaf)).all()
    # The detached 2D backbone must be untouched by the update.
    b0 = state.params["lift"]["backbone2d"]
    b1 = new_state.params["lift"]["backbone2d"]
    for a, b in zip(jax.tree_util.tree_leaves(b0), jax.tree_util.tree_leaves(b1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
