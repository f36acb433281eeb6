"""Device-mesh utilities: data-parallel training over pairs.

The reference has NO multi-device support of any kind (single GPU pinned,
batch=1 — SURVEY.md §2.3); every axis here is new capability.  Because all
shapes are static, pairs batch and shard cleanly: the PairBatch leading
axis lives on the mesh 'data' axis, parameters are replicated, and XLA
inserts the gradient all-reduce over ICI — no hand-written collectives.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pcrcg_tpu.data.pair import PairBatch


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """('data', 'model') mesh.  'data' shards pairs; 'model' (1 or 2) shards
    the two clouds of each pair — the encoder is per-cloud independent, so
    with model=2 each cloud's KPConv stack runs on its own device and XLA
    inserts the all-gather at the cross-attention bottleneck."""
    devices = list(devices if devices is not None else jax.devices())
    n_data = n_data or len(devices) // n_model
    use = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(use, axis_names=("data", "model"))


def shard_pair_batch(batch: PairBatch, mesh: Mesh) -> PairBatch:
    """Pairs on 'data'; the cloud axis (size 2) on 'model' when present."""
    model = "model" if "model" in mesh.axis_names and mesh.shape["model"] > 1 else None

    def put(x):
        if x is None:
            return None
        spec = [None] * x.ndim
        spec[0] = "data"
        if model and x.ndim >= 2 and x.shape[1] == 2:
            spec[1] = model
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Replicate parameters / train state across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_images(images: Optional[dict], mesh: Mesh, batch_size: int):
    """Shard the per-pair image dict on 'data'.  Arrays whose leading axis is
    the pair batch (colors/depths/world2cam/valid_maps) shard; anything else
    (e.g. a shared [4,4] intrinsics) replicates."""
    if images is None:
        return None

    def put(x):
        if x is None:
            return None
        if x.ndim >= 1 and x.shape[0] == batch_size:
            spec = [None] * x.ndim
            spec[0] = "data"
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return {k: put(v) for k, v in images.items()}
