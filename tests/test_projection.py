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


def test_synthetic_render_consistent_with_projection():
    """The accuracy-harness renderer (scripts/train_synthetic_register.py)
    must be geometrically consistent with ops.projection: points project to
    valid pixels (depth test passes) and the gathered image colors equal
    the points' own procedural colors — the property that makes the 2D
    branch carry real signal in the --images evidence run."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import numpy as np
    import jax.numpy as jnp
    from train_synthetic_register import procedural_colors, render_views
    from pcrcg_tpu.ops.projection import gather_pixel_features, project_points

    rng = np.random.default_rng(4)
    # A surface-ish cloud (sphere cap) so the z-buffer has coherent fronts.
    v = rng.normal(size=(4000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = (v * (1.0 + 0.02 * rng.normal(size=(4000, 1)))).astype(np.float32)
    cols = procedural_colors(pts)
    imgs, deps, valid, w2c, intr = render_views(pts, cols, 2, rng, height=120, width=160)

    total_valid = 0
    for i in range(2):
        pix, ok = project_points(
            jnp.asarray(pts), jnp.asarray(deps[i]), jnp.asarray(w2c[i]),
            jnp.asarray(np.asarray(intr, np.float32)),
            jnp.ones(len(pts), bool), thresh=0.1,
        )
        ok = np.asarray(ok)
        total_valid += ok.sum()
        # pix live in the DEPTH (half) resolution — like the real lift,
        # where the backbone's feature map comes out at half the color
        # res.  Downsample the color render to that grid before gathering.
        fmap = jnp.asarray(imgs[i][::2, ::2])  # [60,80,3]
        got = np.asarray(gather_pixel_features(fmap, pix, jnp.asarray(ok)))
        # Front-facing points should read back their own color (splat
        # collisions and bilinear-free nearest reads allow some mismatch).
        err = np.abs(got[ok] - cols[ok]).max(axis=1)
        assert np.median(err) < 0.15, float(np.median(err))
    # Each view faces the cap center from a random side: between the two
    # views most points should be seen at least once.
    assert total_valid > 0.5 * len(pts), total_valid
