"""Chunked feature-space matching helpers (static shapes, on device).

These replace the reference's dense [N, M] feature-score matrices in the
saliency supervision (lib/loss.py:206-224): rows are processed in chunks so
peak memory is O(chunk · M) while the matmuls still ride the MXU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_HIGH = jax.lax.Precision.HIGHEST


def _pad_rows(x: jnp.ndarray, multiple: int) -> jnp.ndarray:
    rem = (-x.shape[0]) % multiple
    if rem == 0:
        return x
    return jnp.pad(x, [(0, rem)] + [(0, 0)] * (x.ndim - 1))


def nearest_feature_neighbor(
    query_feats: jnp.ndarray,
    support_feats: jnp.ndarray,
    support_mask: jnp.ndarray,
    chunk: int = 2048,
) -> jnp.ndarray:
    """argmax_j <query_i, support_j> over valid supports; [Nq] int32.

    Rows are chunked; all-invalid support masks return index 0.
    """
    neg = jnp.finfo(jnp.float32).min
    # bf16 scores: this argmax only picks the best-match INDEX for loss
    # labels (no gradient flows through it); a ~2^-8-relative score error
    # flips the pick only between near-equal matches, which then land on
    # the same side of the downstream distance threshold.  The f32 HIGHEST
    # matmul was 6 MXU passes over a [N, N] product — the single largest
    # loss-stage cost in the train trace.
    sup_t = support_feats.astype(jnp.bfloat16).T

    def one_chunk(q):
        scores = jnp.matmul(
            q.astype(jnp.bfloat16), sup_t, preferred_element_type=jnp.float32
        )
        scores = jnp.where(support_mask[None, :], scores, neg)
        return jnp.argmax(scores, axis=-1).astype(jnp.int32)

    nq = query_feats.shape[0]
    c = min(chunk, nq)
    padded = _pad_rows(query_feats, c)
    out = jax.lax.map(one_chunk, padded.reshape(-1, c, padded.shape[-1]))
    return out.reshape(-1)[:nq]
