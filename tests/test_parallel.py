"""Multi-chip tests on the virtual 8-device CPU mesh: a data-parallel train
step over 8 sharded pairs must run and match the single-device result."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcrcg_tpu.config import tiny_test_config
from pcrcg_tpu.data.pair import make_pair_batch
from pcrcg_tpu.models.kpfcnn import KPFCNN
from pcrcg_tpu.ops.pyramid import build_pyramid
from pcrcg_tpu.parallel.mesh import make_mesh, replicate, shard_pair_batch
from pcrcg_tpu.train.state import create_train_state
from pcrcg_tpu.train.step import train_step


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_data_parallel_train_step():
    cfg = tiny_test_config()
    rng = np.random.default_rng(11)
    samples = []
    for _ in range(8):
        base = rng.uniform(0, 0.5, size=(120, 3)).astype(np.float32)
        samples.append(
            dict(src_pcd=base, tgt_pcd=base[10:110], rot=np.eye(3), trans=np.zeros(3))
        )
    batch = make_pair_batch(samples, cfg.budgets.points[0])

    model = KPFCNN(cfg)
    pyr = build_pyramid(
        batch.points[0], batch.masks[0], cfg.budgets, cfg.first_subsampling_dl, cfg.conv_radius
    )
    variables = model.init(jax.random.key(0), pyr, batch.features[0])
    state = create_train_state(cfg, variables)

    mesh = make_mesh(8)
    sharded = shard_pair_batch(batch, mesh)
    state_r = state.replace(
        params=replicate(state.params, mesh),
        constants=replicate(state.constants, mesh),
        opt_state=replicate(state.opt_state, mesh),
        step=replicate(state.step, mesh),
    )
    new_state, stats = train_step(model, cfg, state_r, sharded, jax.random.key(1))
    assert np.isfinite(float(stats["total"]))

    # Single-device run over the same batch gives the same loss/update.
    new_state_1, stats_1 = train_step(model, cfg, state, batch, jax.random.key(1))
    np.testing.assert_allclose(float(stats["total"]), float(stats_1["total"]), rtol=1e-4)
    a = jax.tree_util.tree_leaves(new_state.params)[0]
    b = jax.tree_util.tree_leaves(new_state_1.params)[0]
    # Slightly loose: XLA:CPU reduction order differs between the GSPMD
    # partition and the single-device program, and under full-suite load
    # the 1e-5 atol flaked once (reduction-order-only difference).
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_shard_map_train_step_matches_single_device():
    """train_step_dp (shard_map data parallelism — the path that keeps the
    scalar-prefetch Pallas kernels) matches the plain train_step bit-for-
    tolerance on loss AND updated params."""
    from pcrcg_tpu.train.step import eval_step, eval_step_dp, train_step_dp

    cfg = tiny_test_config()
    rng = np.random.default_rng(13)
    samples = []
    for _ in range(8):
        base = rng.uniform(0, 0.5, size=(120, 3)).astype(np.float32)
        samples.append(
            dict(src_pcd=base, tgt_pcd=base[10:110], rot=np.eye(3), trans=np.zeros(3))
        )
    batch = make_pair_batch(samples, cfg.budgets.points[0])

    model = KPFCNN(cfg)
    pyr = build_pyramid(
        batch.points[0], batch.masks[0], cfg.budgets, cfg.first_subsampling_dl, cfg.conv_radius
    )
    variables = model.init(jax.random.key(0), pyr, batch.features[0])
    state = create_train_state(cfg, variables)

    mesh = make_mesh(8)
    sharded = shard_pair_batch(batch, mesh)
    state_r = state.replace(
        params=replicate(state.params, mesh),
        constants=replicate(state.constants, mesh),
        opt_state=replicate(state.opt_state, mesh),
        step=replicate(state.step, mesh),
    )
    new_state, stats = train_step_dp(
        model, cfg, state_r, sharded, jax.random.key(1), mesh
    )
    assert np.isfinite(float(stats["total"]))

    new_state_1, stats_1 = train_step(model, cfg, state, batch, jax.random.key(1))
    np.testing.assert_allclose(float(stats["total"]), float(stats_1["total"]), rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(new_state.params),
        jax.tree_util.tree_leaves(new_state_1.params),
    ):
        # Same reduction-order allowance as test_data_parallel_train_step:
        # pmean-of-local-means vs one global mean.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)

    ev = eval_step_dp(model, cfg, state_r, sharded, jax.random.key(2), mesh)
    ev_1 = eval_step(model, cfg, state, batch, jax.random.key(2))
    np.testing.assert_allclose(float(ev["total"]), float(ev_1["total"]), rtol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_data_parallel_color_flagship_train_step():
    """The FLAGSHIP color+geometry model (PCRCG = ResNet50-UNet lift +
    KPFCNN) through the shard_map dp path: per-pair image stacks shard on
    'data' (parallel/mesh.py shard_images) next to the clouds, and the dp
    loss matches the single-device train_step on the same batch."""
    import sys

    from pcrcg_tpu.models.pcrcg import PCRCG
    from pcrcg_tpu.parallel.mesh import shard_images
    from pcrcg_tpu.train.step import train_step_dp

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
    from bench import synthetic_images

    cfg = tiny_test_config(image_feature=True, in_feats_dim=129, img_num=1)
    rng = np.random.default_rng(21)
    samples = []
    for _ in range(8):
        base = rng.uniform(0, 0.5, size=(200, 3)).astype(np.float32)
        samples.append(
            dict(src_pcd=base, tgt_pcd=base[10:190], rot=np.eye(3), trans=np.zeros(3))
        )
    batch = make_pair_batch(samples, cfg.budgets.points[0])
    one_pair = {
        k: jnp.asarray(v)
        for k, v in synthetic_images(cfg.img_num, height=64, width=96).items()
    }
    images = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (8,) + x.shape), one_pair
    )

    model = PCRCG(cfg)
    pyr = build_pyramid(
        batch.points[0], batch.masks[0], cfg.budgets,
        cfg.first_subsampling_dl, cfg.conv_radius,
    )
    variables = model.init(jax.random.key(0), pyr, batch.features[0], one_pair)
    state = create_train_state(cfg, variables)

    mesh = make_mesh(8)
    sharded = shard_pair_batch(batch, mesh)
    images_sharded = shard_images(images, mesh, 8)
    state_r = state.replace(
        params=replicate(state.params, mesh),
        constants=replicate(state.constants, mesh),
        opt_state=replicate(state.opt_state, mesh),
        step=replicate(state.step, mesh),
    )
    _, stats = train_step_dp(
        model, cfg, state_r, sharded, jax.random.key(1), mesh, images=images_sharded
    )
    assert np.isfinite(float(stats["total"]))

    _, stats_1 = train_step(model, cfg, state, batch, jax.random.key(1), images)
    np.testing.assert_allclose(float(stats["total"]), float(stats_1["total"]), rtol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_data_model_parallel_train_step():
    """4-way data x 2-way cloud ('model') sharding must run and match the
    single-device result."""
    cfg = tiny_test_config()
    rng = np.random.default_rng(12)
    samples = []
    for _ in range(4):
        base = rng.uniform(0, 0.5, size=(120, 3)).astype(np.float32)
        samples.append(
            dict(src_pcd=base, tgt_pcd=base[10:110], rot=np.eye(3), trans=np.zeros(3))
        )
    batch = make_pair_batch(samples, cfg.budgets.points[0])

    model = KPFCNN(cfg)
    pyr = build_pyramid(
        batch.points[0], batch.masks[0], cfg.budgets, cfg.first_subsampling_dl, cfg.conv_radius
    )
    variables = model.init(jax.random.key(0), pyr, batch.features[0])
    state = create_train_state(cfg, variables)

    mesh = make_mesh(4, n_model=2)
    sharded = shard_pair_batch(batch, mesh)
    state_r = state.replace(
        params=replicate(state.params, mesh),
        constants=replicate(state.constants, mesh),
        opt_state=replicate(state.opt_state, mesh),
        step=replicate(state.step, mesh),
    )
    _, stats = train_step(model, cfg, state_r, sharded, jax.random.key(1))
    _, stats_1 = train_step(model, cfg, state, batch, jax.random.key(1))
    np.testing.assert_allclose(float(stats["total"]), float(stats_1["total"]), rtol=1e-4)


def test_multihost_helpers_single_process():
    """Single-process degenerate paths: initialize is a no-op, the global
    mesh covers all local devices, the host slice is the whole batch, and
    global_pair_batch shards on 'data'."""
    import jax
    from pcrcg_tpu.parallel import multihost

    multihost.initialize()  # no coordinator configured -> no-op
    mesh = multihost.global_data_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert multihost.host_local_batch_slice(8) == slice(0, 8)

    x = {"a": np.zeros((8, 4), np.float32), "b": None}
    out = multihost.global_pair_batch(x, mesh, 8)
    assert out["b"] is None
    shard_counts = {s.device for s in out["a"].addressable_shards}
    assert len(shard_counts) == len(jax.devices())
