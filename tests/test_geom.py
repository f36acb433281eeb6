import jax.numpy as jnp
import numpy as np

from pcrcg_tpu.geom import se3, so3
from pcrcg_tpu.geom.kernel_points import kernel_dispositions, layer_kernel_points


def random_se3(rng):
    rot = so3.random_rotation(rng)
    t = rng.normal(size=3).astype(np.float32)
    return se3.from_rt(jnp.asarray(rot), jnp.asarray(t))


def test_transform_inverse_roundtrip(rng):
    g = random_se3(rng)
    pts = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
    back = se3.transform(se3.inverse(g), se3.transform(g, pts))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)


def test_concatenate_matches_matrix_product(rng):
    a, b = random_se3(rng), random_se3(rng)
    ab = se3.concatenate(a, b)
    m = np.asarray(se3.to_4x4(a)) @ np.asarray(se3.to_4x4(b))
    np.testing.assert_allclose(np.asarray(se3.to_4x4(ab)), m, atol=1e-5)


def test_quaternion_roundtrip(rng):
    r = jnp.asarray(so3.random_rotation(rng))
    q = so3.quaternion_from_matrix(r)
    r2 = so3.matrix_from_quaternion(q)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r), atol=1e-5)


def test_rotation_error(rng):
    r = jnp.asarray(so3.random_rotation(rng))
    assert float(se3.rotation_error_deg(r, r)) < 1e-2
    rz = jnp.asarray(so3.euler_to_matrix([0.0, 0.0, np.pi / 6]))
    err = float(se3.rotation_error_deg(jnp.eye(3), rz))
    np.testing.assert_allclose(err, 30.0, atol=1e-3)


def test_kernel_dispositions_shape_and_spread():
    kp = kernel_dispositions(15)
    assert kp.shape == (15, 3)
    # center fixed at origin
    np.testing.assert_allclose(kp[0], 0.0, atol=1e-6)
    radii = np.linalg.norm(kp[1:], axis=1)
    # mean non-center radius rescaled to 0.66 (reference ratio)
    np.testing.assert_allclose(radii.mean(), 0.66, atol=1e-3)
    # repulsion should spread points: min pairwise distance not tiny
    d = np.linalg.norm(kp[:, None] - kp[None, :], axis=-1)
    d += np.eye(15) * 10
    assert d.min() > 0.3


def test_layer_kernel_points_differ_by_seed():
    a = layer_kernel_points(0.125, seed=1)
    b = layer_kernel_points(0.125, seed=2)
    assert a.shape == (15, 3)
    assert not np.allclose(a, b)
    # scaled to radius: mean non-center norm ≈ 0.66 * 0.125
    np.testing.assert_allclose(np.linalg.norm(a[1:], axis=1).mean(), 0.66 * 0.125, rtol=0.15)


def test_spherical_lloyd_dispositions():
    """Lloyd variant (auto-selected for K > 30, mirroring the reference's
    kernels/kernel_points.py:396-397 switch): points stay in the unit ball,
    the center stays fixed, cells are well-spread, output is deterministic."""
    from pcrcg_tpu.geom.kernel_points import spherical_lloyd

    kp = spherical_lloyd(35, max_iter=120, seed=3)
    assert kp.shape == (35, 3)
    np.testing.assert_allclose(kp[0], 0.0, atol=1e-7)
    radii = np.linalg.norm(kp, axis=1)
    assert radii.max() <= 1.0 + 1e-5
    d = np.linalg.norm(kp[:, None] - kp[None], axis=-1)
    d[np.arange(35), np.arange(35)] = np.inf
    assert d.min() > 0.15  # no collapsed cells
    kp2 = spherical_lloyd(35, max_iter=120, seed=3)
    np.testing.assert_array_equal(kp, kp2)


def test_kernel_dispositions_method_auto_switch(tmp_path, monkeypatch):
    """K > 30 routes to Lloyd under 'auto'; explicit methods get distinct
    cache files."""
    import pcrcg_tpu.geom.kernel_points as kpmod

    monkeypatch.setattr(kpmod, "_CACHE_DIR", str(tmp_path))
    kpmod.kernel_dispositions.cache_clear()
    auto = kpmod.kernel_dispositions(32, 3, "center", "auto")
    lloyd = kpmod.kernel_dispositions(32, 3, "center", "lloyd")
    np.testing.assert_array_equal(auto, lloyd)
    files = sorted(p.name for p in tmp_path.iterdir())
    assert files == ["k_032_center_3d_lloyd.npy"]
    kpmod.kernel_dispositions.cache_clear()
