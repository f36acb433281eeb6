"""Projection tests vs a numpy oracle of reference projection.py:31-61."""
import jax.numpy as jnp
import numpy as np

from pcrcg_tpu.ops.projection import adjust_intrinsic, gather_pixel_features, project_points


def oracle_projection(points, depth_map, world2camera, intrinsics, thresh=0.1):
    h, w = depth_map.shape
    ones = np.ones((points.shape[0], 1))
    cam = (world2camera @ np.concatenate([points, ones], 1).T).T[:, :3]
    img = (intrinsics @ np.concatenate([cam, ones], 1).T).T[:, :3]
    z = img[:, 2]
    xy = (img[:, :2] / z[:, None]).astype(np.int64)  # trunc like torch .long()
    mask = (xy[:, 1] >= 0) & (xy[:, 1] < h) & (xy[:, 0] >= 0) & (xy[:, 0] < w)
    out2d, out3d = [], []
    for i in np.where(mask)[0]:
        if abs(z[i] - depth_map[xy[i, 1], xy[i, 0]]) < thresh:
            out2d.append(xy[i])
            out3d.append(i)
    return np.array(out2d).reshape(-1, 2), np.array(out3d, np.int64)


def make_scene(rng, n=200):
    h, w = 30, 40
    intr = np.eye(4)
    intr[0, 0] = intr[1, 1] = 20.0
    intr[0, 2], intr[1, 2] = w / 2, h / 2
    points = rng.uniform(-1, 1, size=(n, 3)).astype(np.float64)
    points[:, 2] += 3.0  # in front of camera
    depth = np.full((h, w), 3.0)
    depth += rng.normal(scale=0.5, size=(h, w))
    return points, depth, np.eye(4), intr


def test_projection_matches_oracle(rng):
    points, depth, w2c, intr = make_scene(rng)
    want2d, want3d = oracle_projection(points, depth, w2c, intr)
    pix, valid = project_points(
        jnp.asarray(points, jnp.float32),
        jnp.asarray(depth, jnp.float32),
        jnp.asarray(w2c, jnp.float32),
        jnp.asarray(intr, jnp.float32),
        jnp.ones(len(points), bool),
    )
    got3d = np.where(np.asarray(valid))[0]
    np.testing.assert_array_equal(got3d, want3d)
    np.testing.assert_array_equal(np.asarray(pix)[want3d], want2d)


def test_gather_pixel_features(rng):
    fmap = rng.normal(size=(5, 7, 3)).astype(np.float32)
    pix = np.array([[2, 1], [6, 4], [0, 0]], np.int32)
    valid = np.array([True, True, False])
    out = np.asarray(
        gather_pixel_features(jnp.asarray(fmap), jnp.asarray(pix), jnp.asarray(valid))
    )
    np.testing.assert_allclose(out[0], fmap[1, 2])
    np.testing.assert_allclose(out[1], fmap[4, 6])
    np.testing.assert_allclose(out[2], 0.0)


def test_adjust_intrinsic_reference_case():
    # The reference's exact call: 640x480 -> 160x120 (indoor.py:548-551).
    intr = np.array([[585.0, 0, 320], [0, 585.0, 240], [0, 0, 1]])
    out = adjust_intrinsic(intr, (640, 480), (160, 120))
    np.testing.assert_allclose(out[0, 0], 585.0 * 160 / 640)
    np.testing.assert_allclose(out[1, 1], 585.0 * 120 / 480)
    np.testing.assert_allclose(out[0, 2], 320 * 159 / 639)
    np.testing.assert_allclose(out[1, 2], 240 * 119 / 479)
    # identity when dims match
    np.testing.assert_allclose(adjust_intrinsic(intr, (640, 480), (640, 480)), intr)
