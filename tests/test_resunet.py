"""2D backbone tests: output geometry, torch-checkpoint import, and the
lift's image-priority / detach semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcrcg_tpu.models.lift import ImageLift
from pcrcg_tpu.models.resunet import ResUNet, align_corners_matrix, bilinear_resize


@pytest.fixture(scope="module")
def small_resunet():
    model = ResUNet(output_channel=16, depth=18)
    x = jnp.zeros((1, 48, 64, 3))
    variables = model.init(jax.random.key(0), x)
    return model, variables


def test_resunet_output_half_resolution(small_resunet):
    model, variables = small_resunet
    out = model.apply(variables, jnp.ones((1, 48, 64, 3)))
    assert out.shape == (1, 24, 32, 16)
    assert np.all(np.isfinite(np.asarray(out)))


def test_bilinear_align_corners_matches_linspace():
    # Resizing a linear ramp with align_corners must keep endpoints exact.
    x = jnp.linspace(0, 1, 5).reshape(1, 5, 1, 1)
    y = np.asarray(bilinear_resize(x, (9, 1)))[0, :, 0, 0]
    np.testing.assert_allclose(y, np.linspace(0, 1, 9), atol=1e-6)
    m = align_corners_matrix(4, 7)
    np.testing.assert_allclose(np.asarray(m).sum(-1), 1.0, atol=1e-6)


def test_torch_state_dict_import_roundtrip(small_resunet):
    torch = pytest.importorskip("torch")
    from pcrcg_tpu.models.torch_import import import_torch_resunet

    model, variables = small_resunet
    # Build a torch-format state dict for resnet18 encoder conv1/bn1 and
    # check values land (shape-matched) in the flax tree.
    rng = np.random.default_rng(0)
    conv1 = rng.normal(size=(64, 3, 7, 7)).astype(np.float32)
    state = {
        "conv1.weight": conv1,
        "bn1.weight": np.full(64, 2.0, np.float32),
        "bn1.bias": np.full(64, 0.5, np.float32),
        "bn1.running_mean": np.full(64, 0.1, np.float32),
        "bn1.running_var": np.full(64, 0.9, np.float32),
        "bn1.num_batches_tracked": np.int64(7),
        "fc.weight": rng.normal(size=(10, 512)).astype(np.float32),
        "layer1.0.conv1.weight": rng.normal(size=(64, 64, 3, 3)).astype(np.float32),
    }
    merged, report = import_torch_resunet(state, variables)
    got = merged["params"]["encoder"]["conv1"]["kernel"]
    np.testing.assert_allclose(np.asarray(got), conv1.transpose(2, 3, 1, 0))
    np.testing.assert_allclose(merged["params"]["encoder"]["bn1"]["scale"], 2.0)
    np.testing.assert_allclose(merged["batch_stats"]["encoder"]["bn1"]["var"], 0.9)
    np.testing.assert_allclose(
        merged["params"]["encoder"]["layer1_0"]["conv1"]["kernel"],
        state["layer1.0.conv1.weight"].transpose(2, 3, 1, 0),
    )
    assert report["loaded"] >= 6
    # The flax tree still initializes the model.
    out = ResUNet(output_channel=16, depth=18).apply(
        jax.tree_util.tree_map(jnp.asarray, merged), jnp.ones((1, 48, 64, 3))
    )
    assert out.shape == (1, 24, 32, 16)


def test_image_lift_priority_and_detach(rng):
    n, h, w = 32, 12, 16
    lift = ImageLift(output_channel=8, depth=18)
    pts = np.zeros((2, n, 3), np.float32)
    pts[:, :, 2] = 2.0  # in front of the camera
    pts[:, :, 0] = rng.uniform(-0.5, 0.5, size=(2, n))
    pts[:, :, 1] = rng.uniform(-0.4, 0.4, size=(2, n))
    masks = np.ones((2, n), bool)
    colors = rng.uniform(size=(2, 2, 2 * h, 2 * w, 3)).astype(np.float32)
    depths = np.full((2, 2, h, w), 2.0, np.float32)
    depths[:, 1] = 100.0  # image 2 never depth-consistent
    w2c = np.tile(np.eye(4, dtype=np.float32), (2, 2, 1, 1))
    vmaps = np.ones((2, 2, h, w), np.float32)
    intr = np.eye(4, dtype=np.float32)
    intr[0, 0] = intr[1, 1] = 8.0
    intr[0, 2], intr[1, 2] = w / 2, h / 2

    args = tuple(jnp.asarray(a) for a in (pts, masks, colors, depths, w2c, vmaps, intr))
    variables = lift.init(jax.random.key(0), *args)
    out = lift.apply(variables, *args)
    assert out.shape == (2, n, 9)
    out = np.asarray(out)
    # All points project into image 1 -> lifted features + ones column.
    np.testing.assert_allclose(out[..., -1], 1.0)
    assert np.abs(out[..., :8]).sum() > 0

    # Detach: gradients of a lift-dependent loss w.r.t. backbone are zero.
    def loss(v):
        return jnp.sum(lift.apply(v, *args) ** 2)

    grads = jax.grad(lambda p: loss({"params": p, "batch_stats": variables["batch_stats"]}))(
        variables["params"]
    )
    total = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads))
    assert total == 0.0


def test_torch_import_pri3d_layout(small_resunet, tmp_path):
    """pri3d checkpoints nest under state['model'] with 'backbone.'-prefixed
    encoder keys plus non-backbone heads that must be filtered (reference
    lib/trainer.py:114-127 strips k[9:] and shape-filters)."""
    torch = pytest.importorskip("torch")
    from pcrcg_tpu.models.torch_import import load_backbone2d

    model, variables = small_resunet
    rng = np.random.default_rng(1)
    conv1 = rng.normal(size=(64, 3, 7, 7)).astype(np.float32)
    ckpt = {
        "model": {
            "backbone.conv1.weight": torch.from_numpy(conv1),
            "backbone.bn1.weight": torch.full((64,), 3.0),
            "backbone.bn1.running_mean": torch.full((64,), 0.25),
            # heads that must be skipped, not crash
            "depth_head.conv.weight": torch.zeros(1, 64, 3, 3),
            "sem_head.weight": torch.zeros(20, 64),
        },
        "epoch": 3,
    }
    path = tmp_path / "pri3d.pth"
    torch.save(ckpt, path)
    sub = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    merged, report = load_backbone2d(str(path), sub)
    np.testing.assert_allclose(
        np.asarray(merged["params"]["encoder"]["conv1"]["kernel"]),
        conv1.transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(merged["params"]["encoder"]["bn1"]["scale"], 3.0)
    np.testing.assert_allclose(merged["batch_stats"]["encoder"]["bn1"]["mean"], 0.25)
    assert report["loaded"] == 3
    assert any("depth_head" in k for k in report["skipped_keys"])


def test_torch_import_moco_layout(small_resunet):
    """MoCo v2 raw layout: 'module.encoder_q.' query-encoder keys load; the
    momentum encoder_k and the MLP fc head are skipped."""
    from pcrcg_tpu.models.torch_import import import_torch_resunet

    model, variables = small_resunet
    rng = np.random.default_rng(2)
    conv1 = rng.normal(size=(64, 3, 7, 7)).astype(np.float32)
    conv1_k = rng.normal(size=(64, 3, 7, 7)).astype(np.float32)
    state = {
        "module.encoder_q.conv1.weight": conv1,
        "module.encoder_q.bn1.weight": np.full(64, 1.5, np.float32),
        "module.encoder_q.fc.0.weight": rng.normal(size=(2048, 512)).astype(np.float32),
        "module.encoder_k.conv1.weight": conv1_k,  # momentum encoder: skip
        "queue": np.zeros((128, 65536), np.float32),
        "queue_ptr": np.zeros(1, np.int64),
    }
    merged, report = import_torch_resunet(state, variables)
    np.testing.assert_allclose(
        np.asarray(merged["params"]["encoder"]["conv1"]["kernel"]),
        conv1.transpose(2, 3, 1, 0),  # q encoder, NOT k
    )
    assert report["loaded"] == 2
    assert any("encoder_k" in k for k in report["skipped_keys"])


def test_torch_import_shape_mismatch_filtered(small_resunet):
    """Shape-mismatched tensors are skipped like the reference's
    load_state_with_same_shape, never merged or crashing."""
    from pcrcg_tpu.models.torch_import import import_torch_resunet

    model, variables = small_resunet
    before = np.asarray(variables["params"]["encoder"]["conv1"]["kernel"]).copy()
    state = {"conv1.weight": np.zeros((64, 4, 7, 7), np.float32)}  # 4-ch: wrong
    merged, report = import_torch_resunet(state, variables)
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["encoder"]["conv1"]["kernel"]), before
    )
    assert report["loaded"] == 0 and report["skipped"] == 1
