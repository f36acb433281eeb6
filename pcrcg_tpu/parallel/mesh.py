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


def make_mesh(n_data: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n_data = n_data or len(devices)
    return Mesh(np.asarray(devices[:n_data]).reshape(n_data), axis_names=("data",))


def shard_pair_batch(batch: PairBatch, mesh: Mesh) -> PairBatch:
    """Place the batch with its leading (pair) axis split over 'data'."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Replicate parameters / train state across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
