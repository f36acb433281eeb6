"""On-device point sampling for pose estimation.

Replaces the reference's CPU ``np.random.choice(..., replace=False,
p=overlap*saliency)`` interest-point sampling (lib/tester.py:146-164) with
the Gumbel top-k trick: adding Gumbel noise to log-probabilities and taking
the top-k indices IS a weighted sample without replacement — one fused XLA
op instead of a host round-trip.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def weighted_sample_topk(
    key: jax.Array,
    scores: jnp.ndarray,
    mask: jnp.ndarray,
    n: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sample ``n`` indices without replacement ∝ scores among valid rows.

    Returns (idx [n] int32, valid [n] bool).  When fewer than n valid rows
    exist, the tail indices are repeats of argmax rows with valid=False.
    """
    logp = jnp.log(jnp.maximum(scores, 1e-12))
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(key, scores.shape, minval=1e-20, maxval=1.0)))
    keys = jnp.where(mask, logp + gumbel, -jnp.inf)
    top, idx = jax.lax.top_k(keys, n)
    return idx.astype(jnp.int32), jnp.isfinite(top)
