"""2D↔3D camera projection, on device, static shapes.

Capability parity with reference projection.py:31-61 and the intrinsic
rescaling at datasets/visualize.py:244-275.  Instead of variable-length
(inds2d, inds3d) index lists, every 3D point gets a pixel coordinate and a
validity bit — the fixed-shape equivalent (invalid = out of view or
failing the |projected_z − depth(px)| < thresh consistency test).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def adjust_intrinsic(intrinsic: np.ndarray, from_dim, to_dim) -> np.ndarray:
    """Rescale a pinhole intrinsic from image size ``from_dim`` (w,h) to
    ``to_dim`` (reference datasets/visualize.py:244-275 semantics, including
    the (size−1)/(size−1) principal-point scaling)."""
    if tuple(from_dim) == tuple(to_dim):
        return intrinsic
    out = np.array(intrinsic, dtype=np.float64, copy=True)
    w0, h0 = from_dim
    w1, h1 = to_dim
    if w1 / w0 >= h1 / h0:  # resize limited by height; width keeps aspect
        rh = h1
        rw = (h1 / h0) * w0
    else:
        rw = w1
        rh = (w1 / w0) * h0
    out[0, 0] *= rw / w0
    out[1, 1] *= rh / h0
    out[0, 2] *= (rw - 1) / (w0 - 1)
    out[1, 2] *= (rh - 1) / (h0 - 1)
    return out


def homogeneous_transform(matrix: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """matrix [4,4] (or [3,3] rotation-only), points [N,3] -> [N,3]
    (reference projection.py:13-27)."""
    if matrix.shape[-1] == 3:
        return points @ matrix.T
    return points @ matrix[:3, :3].T + matrix[:3, 3]


def project_points(
    points: jnp.ndarray,
    depth_map: jnp.ndarray,
    world2camera: jnp.ndarray,
    intrinsics: jnp.ndarray,
    point_mask: jnp.ndarray,
    thresh: float = 0.1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """points [N,3], depth_map [H,W], world2camera [4,4], intrinsics [4,4]
    -> (pix_xy [N,2] int32, valid [N] bool).

    pix_xy = trunc(u/z, v/z) like the reference's ``.long()`` cast
    (projection.py:49); valid requires in-bounds, positive depth and depth
    consistency within ``thresh``.
    """
    h, w = depth_map.shape
    cam = homogeneous_transform(world2camera, points)
    img = homogeneous_transform(intrinsics, cam)
    z = img[:, 2]
    xy = jnp.trunc(img[:, :2] / jnp.where(z == 0, 1e-12, z)[:, None]).astype(jnp.int32)
    in_bounds = (xy[:, 0] >= 0) & (xy[:, 0] < w) & (xy[:, 1] >= 0) & (xy[:, 1] < h)
    cx = jnp.clip(xy[:, 0], 0, w - 1)
    cy = jnp.clip(xy[:, 1], 0, h - 1)
    # depth_map[cy, cx] is a scalar gather — ~12 ns/element on TPU (each
    # "row" fetch moves a whole (8,128) tile for 4 bytes of payload;
    # 1.3 ms for the 4×26624 lookups in the images trace).  A W-wide ROW
    # gather + one-hot lane select moves the same tiles but uses all
    # lanes: HBM-bound at ~0.2 ms for the same lookups, bit-identical
    # result (multiply by exact 1.0/0.0 and add zeros are exact).
    rows = depth_map[cy]  # [N, W] row gather
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    depth = jnp.sum(jnp.where(lane == cx[:, None], rows, 0.0), axis=1)
    consistent = jnp.abs(z - depth) < thresh
    valid = in_bounds & consistent & point_mask
    return xy, valid


def unproject(depth: np.ndarray, intrinsics: np.ndarray, pose: np.ndarray) -> np.ndarray:
    """Depth map (meters) [H,W] -> world-space points [M,3] at valid (>0)
    pixels (reference datasets/visualize.py:303-339 semantics, numpy)."""
    h, w = depth.shape
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    z = depth.reshape(-1)
    valid = z > 0
    x = x.reshape(-1)[valid]
    y = y.reshape(-1)[valid]
    z = z[valid]
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    bx = intrinsics[0, 3] if intrinsics.shape[1] > 3 else 0.0
    by = intrinsics[1, 3] if intrinsics.shape[1] > 3 else 0.0
    pts = np.stack([(x - cx) * z / fx + bx, (y - cy) * z / fy + by, z, np.ones_like(z)], 1)
    world = pts @ np.asarray(pose).T
    return world[:, :3]


def gather_pixel_features(
    fmap: jnp.ndarray, pix_xy: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """fmap [H,W,C], pix_xy [N,2] (x,y) -> [N,C], zeros at invalid rows."""
    h, w = fmap.shape[:2]
    cx = jnp.clip(pix_xy[:, 0], 0, w - 1)
    cy = jnp.clip(pix_xy[:, 1], 0, h - 1)
    out = fmap[cy, cx]
    return jnp.where(valid[:, None], out, 0.0)
