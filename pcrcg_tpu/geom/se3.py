"""SE(3) rigid-transform utilities (jnp, batched).

Capability parity with reference common/math/se3.py and
common/math_torch/se3.py, re-expressed as pure jnp functions that work on
arbitrary leading batch dimensions.  A transform is a [..., 3, 4] matrix
(rotation | translation); ``from_rt`` assembles one from rot [...,3,3] and
trans [...,3] or [...,3,1].
"""
from __future__ import annotations

import jax.numpy as jnp


def from_rt(rot: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """rot [...,3,3], trans [...,3] or [...,3,1] -> [...,3,4]."""
    if trans.shape[-1] == 1:
        trans = trans[..., 0]
    return jnp.concatenate([rot, trans[..., None]], axis=-1)


def rot(g: jnp.ndarray) -> jnp.ndarray:
    return g[..., :3, :3]


def trans(g: jnp.ndarray) -> jnp.ndarray:
    return g[..., :3, 3]


def identity(shape=()) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.eye(3, 4), (*shape, 3, 4))


def transform(g: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply g [...,3,4] to pts [...,N,3] -> [...,N,3]
    (reference common/math/se3.py:9-28 semantics)."""
    return pts @ rot(g).swapaxes(-1, -2) + trans(g)[..., None, :]


def inverse(g: jnp.ndarray) -> jnp.ndarray:
    """Inverse of g [...,3,4] (reference common/math/se3.py:30-44)."""
    r = rot(g)
    t = trans(g)
    r_inv = r.swapaxes(-1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", r_inv, t)
    return from_rt(r_inv, t_inv)


def concatenate(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Composition a∘b: (a @ b) on homogeneous coords
    (reference common/math/se3.py:46-60)."""
    r = rot(a) @ rot(b)
    t = jnp.einsum("...ij,...j->...i", rot(a), trans(b)) + trans(a)
    return from_rt(r, t)


def to_4x4(g: jnp.ndarray) -> jnp.ndarray:
    shape = g.shape[:-2]
    bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0]), (*shape, 1, 4))
    return jnp.concatenate([g, bottom], axis=-2)


def rotation_error_deg(r1: jnp.ndarray, r2: jnp.ndarray) -> jnp.ndarray:
    """Relative rotation error in degrees (reference lib/benchmark_utils.py /
    tester.py RRE convention: arccos((tr(R1ᵀR2)-1)/2))."""
    tr = jnp.einsum("...ij,...ij->...", r1, r2)
    cos = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


def translation_error(t1: jnp.ndarray, t2: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.norm(t1 - t2, axis=-1)
