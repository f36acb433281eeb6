"""Host image-pipeline tests against an on-disk 3DMatch-layout fixture.

The fiddliest reference semantics re-implemented by data/images.py, each
asserted against hand-computed values:
* ``.info.txt`` frame-id parsing (reference datasets/indoor.py:94-116),
* img_num ∈ {1,2,3} frame selection (indoor.py:193-206),
* SuperGlue box-splat valid maps (indoor.py:505-547),
* the w2c₂ = pose₂⁻¹ · pose₁ · w2c₁ composition with the augmentation
  rotation folded into w2c₁ (indoor.py:569-597),
* color/depth PNG decode + resize and intrinsics rescale (indoor.py:66-78,
  548-556),
and the full chain IndoorDataset(image_feature=True) → PairLoader →
ImageLift → train step.
"""
import os

import numpy as np
import pytest
from PIL import Image

from pcrcg_tpu.config import tiny_test_config
from pcrcg_tpu.data.images import (
    ImagePairLoader,
    fragment_frame_ids,
    load_color,
    load_depth,
    match_npz_path,
    projection_intrinsics,
    splat_valid_maps,
)

# ---------------------------------------------------------------- fixture

FX = 585.0
FY = 585.0
CX = 320.0
CY = 240.0


def _write_frame(seq_dir, fid: int, pose: np.ndarray, depth_value_mm: int = 1500):
    stem = os.path.join(seq_dir, f"frame-{fid:06d}")
    rng = np.random.default_rng(fid)
    color = rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8)
    Image.fromarray(color).save(stem + ".color.png")
    depth = np.full((480, 640), depth_value_mm, np.uint16)
    Image.fromarray(depth).save(stem + ".depth.png")
    np.savetxt(stem + ".pose.txt", pose)


def _write_matches(path, kpts0, kpts1, matches, conf):
    np.savez(
        path,
        keypoints0=np.asarray(kpts0, np.float64),
        keypoints1=np.asarray(kpts1, np.float64),
        matches=np.asarray(matches, np.int64),
        match_confidence=np.asarray(conf, np.float64),
    )


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    """3DMatch-layout directory tree: two fragments of one scene with
    info.txt / poses / intrinsics / color+depth PNGs / SuperGlue npzs."""
    base = tmp_path_factory.mktemp("threedmatch")
    root = base / "data"
    img_root = base / "images"
    matches_root = base / "matches"
    scene_dir = root / "test" / "scene1"
    scene_dir.mkdir(parents=True)
    matches_root.mkdir()

    rng = np.random.default_rng(0)
    # Fragment clouds live in the camera frame of their FIRST image
    # (pose = cam→world; the fixture's first cameras ARE the fragment
    # frames).  Points sit on the z=1.5 m plane so the constant-1.5 m depth
    # maps pass the ±0.1 m consistency check; a 3D offset between the two
    # fragments' frames is folded into the GT transform.
    n_src, n_tgt = 150, 140
    src = np.stack(
        [rng.uniform(-0.5, 0.5, n_src), rng.uniform(-0.35, 0.35, n_src),
         np.full(n_src, 1.5)], axis=1
    ).astype(np.float32)
    offset = np.array([0.05, -0.03, 0.0], np.float32)
    tgt = np.stack(
        [rng.uniform(-0.5, 0.5, n_tgt), rng.uniform(-0.35, 0.35, n_tgt),
         np.full(n_tgt, 1.5)], axis=1
    ).astype(np.float32)
    # GT: identity rotation, translation = offset (src + offset ≈ overlaps tgt).
    import torch

    torch.save(torch.from_numpy(src), scene_dir / "cloud_bin_0.pth")
    torch.save(torch.from_numpy(tgt), scene_dir / "cloud_bin_1.pth")
    (scene_dir / "cloud_bin_0.info.txt").write_text("scene1 seq-01 5 23\n")
    (scene_dir / "cloud_bin_1.info.txt").write_text("scene1 seq-01 7 30\n")

    seq_dir = img_root / "scene1" / "seq-01"
    seq_dir.mkdir(parents=True)
    intr = np.eye(3)
    intr[0, 0], intr[1, 1], intr[0, 2], intr[1, 2] = FX, FY, CX, CY
    np.savetxt(img_root / "scene1" / "camera-intrinsics.txt", intr)

    poses = {
        5: np.eye(4),
        23: np.block([[np.eye(3), np.array([[0.1], [0.0], [0.0]])], [np.zeros((1, 3)), 1.0]]),
        7: np.eye(4),
        30: np.block([[np.eye(3), np.array([[0.0], [0.2], [0.0]])], [np.zeros((1, 3)), 1.0]]),
        14: np.eye(4),  # img_num=3 midpoints
        18: np.eye(4),
    }
    for fid, pose in poses.items():
        _write_frame(str(seq_dir), fid, pose)

    # SuperGlue dumps for the per-index frame pairings (src_i, tgt_i).
    kp = [[40.5, 30.2], [100.0, 80.0], [37.0, 28.0]]
    for sf, tf in [(5, 7), (23, 30), (14, 18)]:
        _write_matches(
            match_npz_path(str(matches_root), "scene1", "seq-01", str(sf),
                           "scene1", "seq-01", str(tf)),
            kpts0=kp, kpts1=kp, matches=[0, 1, 2], conf=[0.9, 0.4, 0.7],
        )
    return {
        "root": str(root),
        "img_root": str(img_root),
        "matches_root": str(matches_root),
        "poses": poses,
        "src": src,
        "tgt": tgt,
        "offset": offset,
    }


# ------------------------------------------------------------ unit pieces


def test_fragment_frame_ids(fixture):
    ids = fragment_frame_ids(fixture["root"], "test/scene1/cloud_bin_0.pth")
    assert ids == ("scene1", "seq-01", "5", "23")
    ids = fragment_frame_ids(fixture["root"], "test/scene1/cloud_bin_1.pth")
    assert ids == ("scene1", "seq-01", "7", "30")


def test_frame_selection_img_num(fixture):
    ids = ("scene1", "seq-01", "5", "23")
    for img_num, expect in [(1, ["5"]), (2, ["5", "23"]), (3, ["5", "14", "23"])]:
        loader = ImagePairLoader(fixture["img_root"], fixture["matches_root"], img_num)
        assert loader.frame_ids(ids) == expect, img_num


def test_color_depth_decode(fixture):
    cpath, dpath, _ = (
        os.path.join(fixture["img_root"], "scene1", "seq-01", "frame-000005" + ext)
        for ext in (".color.png", ".depth.png", ".pose.txt")
    )
    color = load_color(cpath)
    assert color.shape == (240, 320, 3) and color.dtype == np.float32
    assert 0.0 <= color.min() and color.max() <= 1.0 and color.std() > 0.05
    depth = load_depth(dpath)
    assert depth.shape == (120, 160)
    np.testing.assert_allclose(depth, 1.5)  # 1500 mm -> meters


def test_intrinsics_rescale(fixture):
    intr = projection_intrinsics(fixture["img_root"], "scene1")
    assert intr.shape == (4, 4)
    # 640×480 → 160×120 is a uniform 1/4 scale: fx,fy scale by 1/4; the
    # principal point scales by (size−1)/(size−1) (reference
    # visualize.py:244-275 semantics).
    np.testing.assert_allclose(intr[0, 0], FX * 160 / 640)
    np.testing.assert_allclose(intr[1, 1], FY * 120 / 480)
    np.testing.assert_allclose(intr[0, 2], CX * (160 - 1) / (640 - 1))
    np.testing.assert_allclose(intr[1, 2], CY * (120 - 1) / (480 - 1))
    np.testing.assert_allclose(intr[2:], np.eye(4)[2:])


def test_splat_valid_maps_hand_computed():
    """Box-splat semantics (reference indoor.py:505-547): w-sized boxes
    [k−w, k+w) on the (160,120) [x,y] grid, later matches overwrite, output
    transposed to [120,160]."""
    npz = {
        "keypoints0": np.array([[40.5, 30.2], [43.0, 31.0], [2.0, 3.0]]),
        "keypoints1": np.array([[80.0, 60.0], [90.0, 70.0], [5.0, 5.0], [150.0, 100.0]]),
        "matches": np.array([0, 3, -1]),  # kp0[2] unmatched
        "match_confidence": np.array([0.9, 0.4, 0.8]),
    }
    m0, m1 = splat_valid_maps(npz, window_size=5)
    assert m0.shape == (120, 160) and m1.shape == (120, 160)
    # map0: kp (40.5,30.2) splats conf 0.9 over x∈[35,45), y∈[25,35);
    # kp (43,31) then overwrites x∈[38,48), y∈[26,36) with 0.4.
    assert m0[30, 36] == pytest.approx(0.9)  # [y,x] after transpose
    assert m0[30, 40] == pytest.approx(0.4)  # overlap: LATER match wins
    assert m0[34, 47] == pytest.approx(0.4)
    assert m0[24, 40] == 0.0  # outside y box
    assert m0[60, 100] == 0.0  # far away
    # Unmatched keypoint (matches == -1) must not splat: its box is empty.
    assert m0[3, 2] == pytest.approx(0.0)
    # map1: matched kp1 rows are kp1[matches[valid]] = kp1[0], kp1[3].
    assert m1[60, 80] == pytest.approx(0.9)
    assert m1[100, 150] == pytest.approx(0.4)
    assert m1[5, 5] == 0.0  # kp1[2] never selected
    # Edge clamp: a keypoint at x<w splats from 0 (the reference's negative
    # slice start silently drops these boxes; we clamp — deliberate fix).
    npz_edge = {
        "keypoints0": np.array([[2.0, 3.0]]),
        "keypoints1": np.array([[2.0, 3.0]]),
        "matches": np.array([0]),
        "match_confidence": np.array([1.0]),
    }
    e0, _ = splat_valid_maps(npz_edge, window_size=5)
    assert e0[0, 0] == pytest.approx(1.0)
    assert e0[7, 6] == pytest.approx(1.0)
    assert e0[8, 7] == 0.0


def test_quantized_image_lift_matches_float():
    """uint8 colors / uint16 mm depths through ImageLift must produce
    BIT-identical features to the float path derived from the same raw
    values (the on-device /255 and /1000 mirror the loader's math)."""
    import jax
    import jax.numpy as jnp

    from pcrcg_tpu.models.lift import ImageLift

    rng = np.random.default_rng(5)
    n, h, w = 64, 32, 48
    h2, w2 = h // 2, w // 2
    colors_u8 = rng.integers(0, 256, (2, 1, h, w, 3), dtype=np.uint8)
    depths_u16 = rng.integers(500, 3000, (2, 1, h2, w2), dtype=np.uint16)
    colors_f = colors_u8.astype(np.float32) / 255.0
    depths_f = depths_u16.astype(np.float32) / 1000.0
    points = rng.uniform(-1, 1, (2, n, 3)).astype(np.float32)
    masks = np.ones((2, n), bool)
    w2c = np.broadcast_to(np.eye(4, dtype=np.float32), (2, 1, 4, 4)).copy()
    valid = np.ones((2, 1, h2, w2), np.float32)
    intr = np.array(
        [[20.0, 0, w2 / 2, 0], [0, 20.0, h2 / 2, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float32,
    )
    lift = ImageLift(output_channel=8, depth=50)
    variables = jax.jit(lift.init)(
        jax.random.key(0), points, masks, jnp.asarray(colors_f),
        jnp.asarray(depths_f), jnp.asarray(w2c), jnp.asarray(valid),
        jnp.asarray(intr),
    )
    apply = jax.jit(lift.apply)
    out_f = apply(variables, points, masks, jnp.asarray(colors_f),
                  jnp.asarray(depths_f), w2c, valid, intr)
    out_q = apply(variables, points, masks, jnp.asarray(colors_u8),
                  jnp.asarray(depths_u16), w2c, valid, intr)
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_q))


def test_world2cam_composition(fixture):
    """w2c₁ = inv(aug_rot) on the augmented cloud (else I); w2c₂ =
    pose₂⁻¹ · pose₁ · w2c₁ (reference indoor.py:569-597)."""
    loader = ImagePairLoader(fixture["img_root"], fixture["matches_root"], img_num=2)
    rng = np.random.default_rng(3)
    from pcrcg_tpu.data.indoor import euler_zyx_matrix

    aug_rot = euler_zyx_matrix(rng.random(3) * 2 * np.pi)
    out = loader.load_pair(
        fixture["root"], "test/scene1/cloud_bin_0.pth", "test/scene1/cloud_bin_1.pth",
        aug_rot, aug_src=True, augmented=True,
    )
    w2c = out["world2cam"]  # [2, 2, 4, 4]
    expect_src1 = np.eye(4)
    expect_src1[:3, :3] = np.linalg.inv(aug_rot)
    np.testing.assert_allclose(w2c[0, 0], expect_src1, atol=1e-6)
    pose5, pose23 = fixture["poses"][5], fixture["poses"][23]
    np.testing.assert_allclose(
        w2c[0, 1], np.linalg.inv(pose23) @ pose5 @ expect_src1, atol=1e-6
    )
    # tgt was not the augmented cloud: w2c₁ = I, w2c₂ = pose₃₀⁻¹ · pose₇.
    np.testing.assert_allclose(w2c[1, 0], np.eye(4), atol=1e-6)
    np.testing.assert_allclose(
        w2c[1, 1],
        np.linalg.inv(fixture["poses"][30]) @ fixture["poses"][7], atol=1e-6,
    )
    assert out["colors"].shape == (2, 2, 240, 320, 3)
    assert out["depths"].shape == (2, 2, 120, 160)
    assert out["valid_maps"].shape == (2, 2, 120, 160)
    assert out["intrinsics"].shape == (4, 4)


def test_projection_consistency_under_augmentation(fixture):
    """Projecting the AUGMENTED cloud with the composed w2c must hit the
    same pixels as projecting the raw cloud with identity w2c — the whole
    point of folding aug_rot into world2camera."""
    import jax.numpy as jnp

    from pcrcg_tpu.data.indoor import euler_zyx_matrix
    from pcrcg_tpu.ops.projection import project_points

    rng = np.random.default_rng(5)
    aug_rot = euler_zyx_matrix(rng.random(3) * 2 * np.pi)
    loader = ImagePairLoader(fixture["img_root"], fixture["matches_root"], img_num=1)
    out = loader.load_pair(
        fixture["root"], "test/scene1/cloud_bin_0.pth", "test/scene1/cloud_bin_1.pth",
        aug_rot, aug_src=True, augmented=True,
    )
    intr = jnp.asarray(out["intrinsics"])
    depth = jnp.asarray(out["depths"][0, 0])
    src_raw = fixture["src"]
    src_aug = src_raw @ aug_rot.T
    mask = jnp.ones(src_raw.shape[0], bool)
    pix_aug, valid_aug = project_points(
        jnp.asarray(src_aug), depth, jnp.asarray(out["world2cam"][0, 0]), intr, mask
    )
    pix_raw, valid_raw = project_points(
        jnp.asarray(src_raw), depth, jnp.eye(4), intr, mask
    )
    np.testing.assert_array_equal(np.asarray(valid_aug), np.asarray(valid_raw))
    assert np.asarray(valid_raw).sum() > 100  # z=1.5 plane points do project
    np.testing.assert_array_equal(
        np.asarray(pix_aug)[np.asarray(valid_aug)],
        np.asarray(pix_raw)[np.asarray(valid_raw)],
    )


# ------------------------------------------------------------- end to end


@pytest.mark.slow
def test_dataset_loader_lift_train_step(fixture):
    """IndoorDataset(image_feature=True) → PairLoader → ImageLift → one
    train step: the lift must place real image features on projected points
    and the step must produce a finite loss."""
    import jax
    import jax.numpy as jnp

    from pcrcg_tpu.data.indoor import IndoorDataset
    from pcrcg_tpu.data.loader import PairLoader
    from pcrcg_tpu.models.pcrcg import PCRCG
    from pcrcg_tpu.ops.pyramid import build_pyramid
    from pcrcg_tpu.train.state import create_train_state
    from pcrcg_tpu.train.step import train_step

    cfg = tiny_test_config(
        image_feature=True,
        in_feats_dim=129,
        img_num=1,
        init_mode="random",
        root=fixture["root"],
        img_path=fixture["img_root"],
        superglue_matches_path=fixture["matches_root"],
        window_size=20,  # wide splat boxes: many projected points gated in
    )
    infos = {
        "rot": [np.eye(3, dtype=np.float32)],
        "trans": [fixture["offset"].reshape(3, 1)],
        "src": ["test/scene1/cloud_bin_0.pth"],
        "tgt": ["test/scene1/cloud_bin_1.pth"],
        "overlap": [0.7],
    }
    ds = IndoorDataset(infos, cfg, data_augmentation=True)
    loader = PairLoader(ds, cfg.budgets.points[0], num_threads=2, seed=0)
    batch, images = next(iter(loader))
    assert images is not None
    assert images["colors"].shape == (1, 2, 1, 240, 320, 3)

    model = PCRCG(cfg)
    pyr = build_pyramid(
        batch.points[0], batch.masks[0], cfg.budgets,
        cfg.first_subsampling_dl, cfg.conv_radius,
    )
    im0 = jax.tree_util.tree_map(lambda x: jnp.asarray(x[0]), images)
    variables = model.init(jax.random.key(0), pyr, batch.features[0], im0)

    # The lift must produce non-trivial feature rows (projection found valid
    # pixels; gating maps are non-zero around the splatted keypoints) — run
    # ImageLift standalone with the model's own variables subtree.
    from pcrcg_tpu.models.lift import ImageLift

    lift_vars = {
        "params": variables["params"]["lift"],
        "batch_stats": variables["batch_stats"]["lift"],
    }
    lifted = ImageLift(compute_dtype=cfg.image_compute_dtype).apply(
        lift_vars, batch.points[0], batch.masks[0],
        im0["colors"], im0["depths"], im0["world2cam"], im0["valid_maps"],
        im0["intrinsics"],
    )
    rows = np.asarray(lifted[0])
    real = rows[np.asarray(batch.masks[0][0])]
    # A truly lifted row is neither the all-ones fallback (no valid image)
    # nor the zero-gated [0...0, 1] pattern (valid pixel outside every
    # splatted confidence box).
    row_is_ones = np.all(np.abs(real - 1.0) < 1e-6, axis=1)
    row_is_gated = np.all(np.abs(real[:, :-1]) < 1e-9, axis=1)
    assert (~row_is_ones & ~row_is_gated).any(), "no point received lifted image features"

    state = create_train_state(cfg, variables, steps_per_epoch=1)
    bi = jax.tree_util.tree_map(jnp.asarray, images)
    new_state, stats = train_step(model, cfg, state, batch, jax.random.key(1), bi)
    assert np.isfinite(float(stats["total"]))
    # Frozen backbone untouched (reference never optimizes backbone2d).
    b0 = state.params["lift"]["backbone2d"]
    b1 = new_state.params["lift"]["backbone2d"]
    for a, b in zip(jax.tree_util.tree_leaves(b0), jax.tree_util.tree_leaves(b1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
