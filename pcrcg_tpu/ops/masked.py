"""Masked-array primitives shared across the framework.

Static-shape convention (design stance, SURVEY.md §7):
* every point array is padded to a fixed budget; ``mask`` marks real rows;
* pad rows of point arrays hold ``PAD_COORD`` (the reference's shadow-point
  coordinate, models/blocks.py:269) so distances to pads are huge;
* neighbor-index arrays hold values in [0, N] where N (== len(supports))
  is the shadow index, exactly the C++ padding convention
  (reference cpp_neighbors/neighbors.cpp:324).
"""
from __future__ import annotations

import jax.numpy as jnp

# Shadow coordinate for pad points (reference models/blocks.py:269).
PAD_COORD = 1.0e6


def pad_gather(x: jnp.ndarray, idx: jnp.ndarray, fill_value=0.0) -> jnp.ndarray:
    """Gather rows of x [N, ...] at idx [...], treating idx == N (or any
    out-of-range index) as a shadow row filled with ``fill_value``.

    Equivalent to the reference's ``cat([x, shadow_row]); x[idx]`` pattern
    (models/blocks.py:269,348) without materializing the concat.
    """
    return jnp.take(x, idx, axis=0, mode="fill", fill_value=fill_value)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis, keepdims: bool = False):
    """Mean of x over ``axis`` counting only rows where mask (broadcastable
    to x) is true."""
    m = mask.astype(x.dtype)
    total = jnp.sum(x * m, axis=axis, keepdims=keepdims)
    count = jnp.maximum(jnp.sum(jnp.broadcast_to(m, x.shape), axis=axis, keepdims=keepdims), 1.0)
    return total / count


def masked_instance_norm(x: jnp.ndarray, mask: jnp.ndarray, axis, eps: float = 1e-5) -> jnp.ndarray:
    """Per-channel normalization over the masked ``axis`` dims.

    Matches torch ``InstanceNorm1d/2d`` with ``affine=False`` (biased
    variance, eps=1e-5) as used by the reference's "BatchNormBlock"
    (models/blocks.py:448 — an InstanceNorm over the full stacked point dim)
    and the GNN (models/gcn.py:100-106,146), restricted to real rows.

    x: [..., C]; mask: broadcastable to x's non-channel dims.
    axis: dims to normalize over (the reference normalizes jointly over the
    src+tgt stacked rows, so pass both the cloud and point axes).
    """
    m = mask.astype(x.dtype)[..., None]
    mean = masked_mean(x, m, axis=axis, keepdims=True)
    var = masked_mean((x - mean) ** 2, m, axis=axis, keepdims=True)
    normed = (x - mean) / jnp.sqrt(var + eps)
    return normed * m  # keep pad rows at zero


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Softmax over ``axis`` with invalid entries excluded.  Rows with no
    valid entry return all-zero (instead of NaN)."""
    neg = jnp.finfo(logits.dtype).min
    masked_logits = jnp.where(mask, logits, neg)
    masked_logits = masked_logits - jnp.max(masked_logits, axis=axis, keepdims=True)
    unnorm = jnp.exp(masked_logits) * mask.astype(logits.dtype)
    denom = jnp.sum(unnorm, axis=axis, keepdims=True)
    return unnorm / jnp.maximum(denom, 1e-12)


def masked_logsumexp(x: jnp.ndarray, mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """logsumexp over ``axis`` restricted to masked entries; rows with no
    valid entries return a large negative value."""
    neg = -1.0e9
    masked_x = jnp.where(mask, x, neg)
    mx = jnp.maximum(jnp.max(masked_x, axis=axis, keepdims=True), neg)
    s = jnp.sum(jnp.exp(masked_x - mx) * mask.astype(x.dtype), axis=axis, keepdims=True)
    out = mx + jnp.log(jnp.maximum(s, 1e-30))
    return jnp.squeeze(out, axis=axis)
