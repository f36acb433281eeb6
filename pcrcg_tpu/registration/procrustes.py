"""Weighted rigid fit (Kabsch / weighted Procrustes), batched jnp.

Capability parity with reference compute_rigid_transform
(lib/tester.py:210-245): weighted centroids, weighted covariance, SVD with
the det-flip trick (negate the last right-singular vector when the raw
rotation has det < 0).  Pure tensor math → vmap-able for RANSAC hypotheses.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-6


def rigid_transform(a: jnp.ndarray, b: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """a [...,M,3], b [...,M,3], weights [...,M] -> T [...,3,4] with
    T·a ≈ b (rotation | translation)."""
    w = weights[..., None]
    w = w / (jnp.sum(w, axis=-2, keepdims=True) + _EPS)
    centroid_a = jnp.sum(a * w, axis=-2)
    centroid_b = jnp.sum(b * w, axis=-2)
    a_c = a - centroid_a[..., None, :]
    b_c = b - centroid_b[..., None, :]
    cov = jnp.swapaxes(a_c, -1, -2) @ (b_c * w)

    u, _, vt = jnp.linalg.svd(cov, full_matrices=True)
    v = jnp.swapaxes(vt, -1, -2)
    rot_pos = v @ jnp.swapaxes(u, -1, -2)
    v_neg = v.at[..., :, 2].multiply(-1.0)
    rot_neg = v_neg @ jnp.swapaxes(u, -1, -2)
    det = jnp.linalg.det(rot_pos)
    rot = jnp.where((det > 0)[..., None, None], rot_pos, rot_neg)

    trans = centroid_b[..., :, None] - rot @ centroid_a[..., :, None]
    return jnp.concatenate([rot, trans], axis=-1)


def _quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w,x,y,z) [...,4] -> rotation matrix [...,3,3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def rigid_transform_horn(
    a: jnp.ndarray, b: jnp.ndarray, weights: jnp.ndarray, iters: int = 30
) -> jnp.ndarray:
    """Weighted rigid fit via Horn's quaternion method, TPU-native.

    The optimal rotation is the dominant eigenvector of the 4×4 matrix K
    built from the weighted covariance; it is found with a FIXED-length
    power iteration (pure 4×4 matmuls — no SVD/eigendecomposition, which
    lower to slow serialized loops on TPU).  This is the hypothesis-fit
    used inside RANSAC where tens of thousands of tiny Procrustes solves
    run vmapped; ``rigid_transform`` (SVD) stays for reference parity.
    """
    w = weights[..., None]
    w = w / (jnp.sum(w, axis=-2, keepdims=True) + _EPS)
    centroid_a = jnp.sum(a * w, axis=-2)
    centroid_b = jnp.sum(b * w, axis=-2)
    a_c = a - centroid_a[..., None, :]
    b_c = b - centroid_b[..., None, :]
    m = jnp.swapaxes(a_c, -1, -2) @ (b_c * w)  # [...,3,3] covariance

    sxx, sxy, sxz = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    syx, syy, syz = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    szx, szy, szz = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    k = jnp.stack(
        [
            jnp.stack([sxx + syy + szz, syz - szy, szx - sxz, sxy - syx], -1),
            jnp.stack([syz - szy, sxx - syy - szz, sxy + syx, szx + sxz], -1),
            jnp.stack([szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy], -1),
            jnp.stack([sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz], -1),
        ],
        axis=-2,
    )
    # Shift so the dominant eigenvalue of (K + cI) is the largest-magnitude
    # one without crushing the eigengap: Gershgorin lower bound on λ_min.
    gersh = jnp.min(
        jnp.diagonal(k, axis1=-2, axis2=-1)
        - (jnp.sum(jnp.abs(k), axis=-1) - jnp.abs(jnp.diagonal(k, axis1=-2, axis2=-1))),
        axis=-1,
    )
    c = jnp.maximum(-gersh, 0.0) + _EPS
    k = k + c[..., None, None] * jnp.eye(4, dtype=k.dtype)

    q = jnp.full(k.shape[:-1], 0.5, k.dtype)  # [...,4] init
    for _ in range(iters):
        q = jnp.einsum("...ij,...j->...i", k, q)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)

    rot = _quat_to_rot(q)
    trans = centroid_b[..., :, None] - rot @ centroid_a[..., :, None]
    return jnp.concatenate([rot, trans], axis=-1)


def rigid_transform_3pt(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact rigid transform from 3 (or more — only the first 3 are used)
    correspondences via orthonormal-frame construction: no eigensolve, pure
    vector algebra, ideal for vmapped RANSAC hypothesis fitting on TPU.

    a, b: [...,≥3,3].  Exact for rigid-consistent triples; for noisy
    triples it is the standard 3-point estimate.
    """

    def frame(p):
        e1 = p[..., 1, :] - p[..., 0, :]
        e1 = e1 / jnp.maximum(jnp.linalg.norm(e1, axis=-1, keepdims=True), _EPS)
        u = p[..., 2, :] - p[..., 0, :]
        e2 = u - jnp.sum(u * e1, axis=-1, keepdims=True) * e1
        e2 = e2 / jnp.maximum(jnp.linalg.norm(e2, axis=-1, keepdims=True), _EPS)
        e3 = jnp.cross(e1, e2)
        return jnp.stack([e1, e2, e3], axis=-1)  # [...,3,3] columns

    ea = frame(a)
    eb = frame(b)
    rot = eb @ jnp.swapaxes(ea, -1, -2)
    centroid_a = jnp.mean(a[..., :3, :], axis=-2)
    centroid_b = jnp.mean(b[..., :3, :], axis=-2)
    trans = centroid_b[..., :, None] - rot @ centroid_a[..., :, None]
    return jnp.concatenate([rot, trans], axis=-1)
