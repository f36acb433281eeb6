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
