"""Overlap-attention GNN at the bottleneck: DGCNN-style self-attention and
SuperGlue-style cross-attention (capability parity with reference
models/gcn.py:37-218), masked and static-shape.

TPU-first redesign notes:
* the reference builds its kNN graph with a full N×N distance matrix plus a
  [B,C,N,N] feature repeat (gcn.py:48-57) — here the kNN comes from the
  shared neighborhood engine (top-k over chunked distance tiles) and
  features are gathered directly: O(N·k·C) memory instead of O(N²·C);
* InstanceNorm2d/1d (affine=False) become masked per-channel normalizations
  over the real points of EACH cloud separately (the reference runs src and
  tgt through the GNN as separate batch items, so stats are per-cloud);
* the cross-attention softmax is masked over real target points.

Layout: features [N, C] per cloud inside the module (the GCN wrapper maps
over the two clouds where the reference loops).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from pcrcg_tpu.models.blocks import make_dense
from pcrcg_tpu.ops.masked import masked_instance_norm, masked_softmax, pad_gather
from pcrcg_tpu.ops.neighbors import knn_search


def graph_features(coords, feats, mask, k: int, query_chunk: int):
    """DGCNN edge features [N, k, 2C]: [x_i, x_j − x_i] over the coordinate
    kNN graph, self excluded (reference gcn.py:37-64).  Pad neighbors
    (index == N) gather zeros, and their edge feature is zeroed."""
    n = coords.shape[0]
    idx, _ = knn_search(coords, coords, mask, k + 1, query_chunk)
    idx = idx[:, 1:]  # drop self (nearest)
    nbr = pad_gather(feats, idx, 0.0)  # [N, k, C]
    valid = (idx < n)[..., None]
    center = jnp.broadcast_to(feats[:, None, :], nbr.shape)
    edge = jnp.concatenate([center, nbr - center], axis=-1)
    return jnp.where(valid, edge, 0.0), valid[..., 0]


class SelfAttention(nn.Module):
    """Two-round edge conv + fuse (reference gcn.py:96-134).  All three
    convs are 1×1 (Dense over channels), InstanceNorm2d(affine=False) →
    masked norm over (N, k), LeakyReLU(0.2), max over k."""

    dim: int
    k: int = 10
    query_chunk: int = 1024

    @nn.compact
    def __call__(self, coords, feats, mask):
        def edge_round(x, out_dim, name):
            e, e_mask = graph_features(coords, x, mask, self.k, self.query_chunk)
            e = make_dense(out_dim, use_bias=False, name=name)(e)
            e = masked_instance_norm(e, e_mask & mask[:, None], axis=(0, 1))
            e = nn.leaky_relu(e, 0.2)
            # Max over the k neighbors; invalid edges already zero (the
            # reference has no invalid edges; zeros match its behavior for
            # fully-padded rows, which are masked downstream anyway).
            return jnp.max(e, axis=1)

        x0 = feats
        x1 = edge_round(x0, self.dim, "conv1")
        x2 = edge_round(x1, self.dim * 2, "conv2")
        x3 = jnp.concatenate([x0, x1, x2], axis=-1)
        x3 = make_dense(self.dim, use_bias=False, name="conv3")(x3)
        x3 = masked_instance_norm(x3, mask, axis=(0,))
        return nn.leaky_relu(x3, 0.2)


class MultiHeadedAttention(nn.Module):
    """SuperGlue-style MHA with 1×1-conv projections (gcn.py:151-175)."""

    num_heads: int
    d_model: int

    @nn.compact
    def __call__(self, query, key, value, key_mask):
        d = self.d_model // self.num_heads
        q = make_dense(self.d_model, True, name="proj_q")(query)
        k = make_dense(self.d_model, True, name="proj_k")(key)
        v = make_dense(self.d_model, True, name="proj_v")(value)
        # Head split is DIM-MAJOR: the reference views [B, d_model, N] as
        # [B, d, H, N] (gcn.py:170-173), so head h owns the STRIDED channel
        # set {c : c % H == h}, not a contiguous block.
        q = q.reshape(-1, d, self.num_heads)
        k = k.reshape(-1, d, self.num_heads)
        v = v.reshape(-1, d, self.num_heads)
        scores = jnp.einsum("ndh,mdh->hnm", q, k) / (d**0.5)
        prob = masked_softmax(scores, key_mask[None, None, :], axis=-1)
        x = jnp.einsum("hnm,mdh->ndh", prob, v)
        return make_dense(self.d_model, True, name="merge")(x.reshape(-1, self.d_model))


class AttentionalPropagation(nn.Module):
    """message = MHA(x, source); MLP([2C → 2C → C]) with InstanceNorm1d +
    ReLU between layers, final bias zero-init (gcn.py:139-186)."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, source, x_mask, source_mask):
        message = MultiHeadedAttention(self.num_heads, self.dim, name="attn")(
            x, source, source, source_mask
        )
        y = jnp.concatenate([x, message], axis=-1)
        y = make_dense(2 * self.dim, True, name="mlp1")(y)
        y = masked_instance_norm(y, x_mask, axis=(0,))
        y = nn.relu(y)
        return make_dense(self.dim, True, name="mlp2")(y)


class GCN(nn.Module):
    """Alternating self/cross attention (reference gcn.py:188-218):
    residual adds for cross layers only."""

    num_heads: int
    dim: int
    k: int
    layer_names: Tuple[str, ...] = ("self", "cross", "self")
    query_chunk: int = 1024

    @nn.compact
    def __call__(self, coords0, coords1, desc0, desc1, mask0, mask1):
        for i, name in enumerate(self.layer_names):
            if name == "self":
                layer = SelfAttention(self.dim, self.k, self.query_chunk, name=f"self_{i}")
                desc0 = layer(coords0, desc0, mask0)
                desc1 = layer(coords1, desc1, mask1)
            elif name == "cross":
                layer = AttentionalPropagation(self.dim, self.num_heads, name=f"cross_{i}")
                # Sequential update: desc1's message reads the UPDATED desc0
                # (reference gcn.py:212-213 reassigns desc0 first).
                desc0 = desc0 + layer(desc0, desc1, mask0, mask1)
                desc1 = desc1 + layer(desc1, desc0, mask1, mask0)
            else:
                raise ValueError(f"Unknown GCN layer: {name}")
        return desc0, desc1
