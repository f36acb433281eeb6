"""SO(3) helpers: Euler/quaternion conversions and random rotations (numpy &
jnp).  Capability parity with reference common/math/so3.py and
models/r_eval.py, written against standard formulas."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def euler_to_matrix(angles) -> np.ndarray:
    """XYZ intrinsic euler angles (radians) -> rotation matrix, numpy."""
    ax, ay, az = angles
    cx, sx = np.cos(ax), np.sin(ax)
    cy, sy = np.cos(ay), np.sin(ay)
    cz, sz = np.cos(az), np.sin(az)
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return (rz @ ry @ rx).astype(np.float32)


def random_rotation(rng: np.random.Generator, max_angle: float = 2 * np.pi) -> np.ndarray:
    """Random rotation built from uniform euler angles in [0, max_angle) —
    the reference's augmentation convention (datasets/indoor.py:151-160)."""
    angles = rng.uniform(0.0, max_angle, size=3)
    return euler_to_matrix(angles)


def quaternion_from_matrix(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [...,3,3] -> unit quaternion (w, x, y, z), robust
    branchless form (parity with reference models/r_eval.py:5-63)."""
    m00, m01, m02 = r[..., 0, 0], r[..., 0, 1], r[..., 0, 2]
    m10, m11, m12 = r[..., 1, 0], r[..., 1, 1], r[..., 1, 2]
    m20, m21, m22 = r[..., 2, 0], r[..., 2, 1], r[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate constructions; pick the numerically safest.
    qw = jnp.sqrt(jnp.maximum(0.0, 1.0 + tr)) / 2
    qx = jnp.sqrt(jnp.maximum(0.0, 1.0 + m00 - m11 - m22)) / 2
    qy = jnp.sqrt(jnp.maximum(0.0, 1.0 - m00 + m11 - m22)) / 2
    qz = jnp.sqrt(jnp.maximum(0.0, 1.0 - m00 - m11 + m22)) / 2
    qx = jnp.copysign(qx, m21 - m12)
    qy = jnp.copysign(qy, m02 - m20)
    qz = jnp.copysign(qz, m10 - m01)
    q = jnp.stack([qw, qx, qy, qz], axis=-1)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def matrix_from_quaternion(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w,x,y,z) -> rotation matrix [...,3,3]."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1)
    row1 = jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1)
    row2 = jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def dcm2euler(mats: np.ndarray, seq: str = "zyx") -> np.ndarray:
    """Rotation matrices [B,3,3] -> euler angles degrees (reference
    common/math/so3.py:dcm2euler via scipy)."""
    from scipy.spatial.transform import Rotation

    return Rotation.from_matrix(mats).as_euler(seq, degrees=True)
