"""Registration tests: Procrustes exactness, RANSAC recovery of a known
transform under outliers, weighted sampling distribution sanity."""
import jax
import jax.numpy as jnp
import numpy as np

from pcrcg_tpu.geom import so3
from pcrcg_tpu.registration.procrustes import rigid_transform
from pcrcg_tpu.registration.ransac import feature_correspondences, ransac_pose
from pcrcg_tpu.registration.sampling import weighted_sample_topk


def test_procrustes_recovers_exact_transform(rng):
    rot = so3.random_rotation(rng)
    t = rng.normal(size=3).astype(np.float32)
    a = rng.normal(size=(50, 3)).astype(np.float32)
    b = a @ rot.T + t
    T = np.asarray(rigid_transform(jnp.asarray(a), jnp.asarray(b), jnp.ones(50)))
    np.testing.assert_allclose(T[:, :3], rot, atol=1e-5)
    np.testing.assert_allclose(T[:, 3], t, atol=1e-5)


def test_procrustes_weights_ignore_outliers(rng):
    rot = so3.random_rotation(rng)
    t = rng.normal(size=3).astype(np.float32)
    a = rng.normal(size=(60, 3)).astype(np.float32)
    b = a @ rot.T + t
    b[50:] += 5.0  # corrupted rows
    w = np.ones(60, np.float32)
    w[50:] = 0.0
    T = np.asarray(rigid_transform(jnp.asarray(a), jnp.asarray(b), jnp.asarray(w)))
    np.testing.assert_allclose(T[:, :3], rot, atol=1e-5)


def test_ransac_recovers_transform_with_outliers(rng):
    rot = so3.random_rotation(rng)
    t = np.array([0.3, -0.2, 0.5], np.float32)
    n = 256
    src = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    tgt = (src @ rot.T + t).astype(np.float32)
    corr = np.arange(n, dtype=np.int32)
    # 40% outlier correspondences.
    n_out = n * 2 // 5
    corr[:n_out] = rng.integers(0, n, size=n_out)
    res = ransac_pose(
        jax.random.key(0),
        jnp.asarray(src),
        jnp.asarray(tgt),
        jnp.asarray(corr),
        jnp.ones(n, bool),
        distance_threshold=0.05,
        ransac_n=3,
        num_iterations=2048,
        hypothesis_chunk=256,
    )
    T = np.asarray(res.transform)
    np.testing.assert_allclose(T[:, :3], rot, atol=1e-3)
    np.testing.assert_allclose(T[:, 3], t, atol=1e-3)
    assert float(res.fitness) > 0.55


def test_feature_correspondences_mutual(rng):
    f = rng.normal(size=(20, 8)).astype(np.float32)
    f /= np.linalg.norm(f, axis=-1, keepdims=True)
    src_mask = np.ones(20, bool)
    idx, valid = feature_correspondences(
        jnp.asarray(f), jnp.asarray(f), jnp.asarray(src_mask), jnp.asarray(src_mask), mutual=True
    )
    np.testing.assert_array_equal(np.asarray(idx), np.arange(20))
    assert np.asarray(valid).all()


def test_weighted_sampling_prefers_high_scores():
    scores = jnp.asarray(np.concatenate([np.full(50, 1e-6), np.full(50, 1.0)]).astype(np.float32))
    mask = jnp.ones(100, bool)
    idx, valid = weighted_sample_topk(jax.random.key(0), scores, mask, 30)
    assert np.asarray(valid).all()
    assert (np.asarray(idx) >= 50).mean() > 0.9
    assert len(np.unique(np.asarray(idx))) == 30  # without replacement


def test_weighted_sampling_respects_mask():
    scores = jnp.ones(40)
    mask = jnp.zeros(40, bool).at[:10].set(True)
    idx, valid = weighted_sample_topk(jax.random.key(1), scores, mask, 20)
    assert np.asarray(valid)[:10].all() and not np.asarray(valid)[10:].any()
    assert (np.asarray(idx)[np.asarray(valid)] < 10).all()


def test_horn_matches_svd_procrustes(rng):
    from pcrcg_tpu.registration.procrustes import rigid_transform_horn

    rot = so3.random_rotation(rng)
    t = rng.normal(size=3).astype(np.float32)
    a = rng.normal(size=(40, 3)).astype(np.float32)
    b = (a @ rot.T + t + rng.normal(scale=0.01, size=(40, 3))).astype(np.float32)
    w = rng.uniform(0.5, 1.0, size=40).astype(np.float32)
    T_svd = np.asarray(rigid_transform(jnp.asarray(a), jnp.asarray(b), jnp.asarray(w)))
    T_horn = np.asarray(rigid_transform_horn(jnp.asarray(a), jnp.asarray(b), jnp.asarray(w)))
    np.testing.assert_allclose(T_horn, T_svd, atol=1e-4)

    # Batched 3-point hypotheses (the RANSAC inner fit) via the exact
    # frame method.
    from pcrcg_tpu.registration.procrustes import rigid_transform_3pt

    a3 = rng.normal(size=(64, 3, 3)).astype(np.float32)
    rots = np.stack([so3.random_rotation(rng) for _ in range(64)])
    shifts = rng.normal(size=(64, 1, 3)).astype(np.float32)
    b3 = np.einsum("bij,bnj->bni", rots, a3) + shifts
    T = np.asarray(rigid_transform_3pt(jnp.asarray(a3), jnp.asarray(b3)))
    np.testing.assert_allclose(T[:, :, :3], rots, atol=1e-4)
    np.testing.assert_allclose(T[:, :, 3], shifts[:, 0], atol=1e-4)
