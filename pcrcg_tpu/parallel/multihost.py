"""Multi-host (multi-process) scaling: DCN between hosts, ICI within.

The reference is single-GPU/single-process (SURVEY.md §2.3); this is new
capability.  The model is pure data parallelism over pairs — parameters
replicate, per-pair work never crosses a chip — so the multi-host story
is exactly JAX's standard one:

  1. every process calls :func:`initialize` (a no-op single-process);
  2. a global mesh over ``jax.devices()`` (all hosts' chips) shards the
     pair batch on 'data';
  3. each host feeds only its own shard via
     :func:`host_local_batch_slice` +
     ``jax.make_array_from_process_local_data``, so raw fragments never
     cross DCN — only the gradient all-reduce does, and XLA routes the
     intra-host portion over ICI.

Used by Trainer when ``jax.process_count() > 1``; safe to import and call
in single-process runs (everything degrades to the local path).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env-var fallbacks
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, or full TPU-pod
    auto-detection when none are set).  No-op when single-process and no
    coordinator is configured."""
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if coordinator_address is None and jax.process_count() == 1:
        # Nothing to coordinate: plain single-process run.
        return
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes or os.environ.get("NUM_PROCESSES"):
        kwargs["num_processes"] = int(num_processes or os.environ["NUM_PROCESSES"])
    if process_id is not None or os.environ.get("PROCESS_ID"):
        pid = process_id if process_id is not None else os.environ["PROCESS_ID"]
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)


def global_data_mesh() -> Mesh:
    """A 1-axis 'data' mesh over every chip of every host."""
    import numpy as np

    return Mesh(np.asarray(jax.devices()), axis_names=("data",))


def host_local_batch_slice(global_batch_size: int) -> slice:
    """The slice of the GLOBAL pair batch this host must load.  The data
    pipeline stays host-local: each process reads only its own pairs."""
    n_proc = jax.process_count()
    if global_batch_size % n_proc != 0:
        raise ValueError(
            f"global batch size {global_batch_size} not divisible by "
            f"process count {n_proc}"
        )
    per = global_batch_size // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def global_pair_batch(local_tree, mesh: Mesh, global_batch_size: int):
    """Assemble a globally-sharded PairBatch (or any pytree with the pair
    axis leading) from each process's local shard.  Single-process: a
    plain device_put with the 'data' sharding."""
    if jax.process_count() == 1:
        def put(x):
            if x is None:
                return None
            spec = [None] * x.ndim
            spec[0] = "data"
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))

        return jax.tree_util.tree_map(put, local_tree)

    def assemble(x):
        if x is None:
            return None
        spec = [None] * x.ndim
        spec[0] = "data"
        global_shape = (global_batch_size,) + tuple(x.shape[1:])
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(*spec)), x, global_shape
        )

    return jax.tree_util.tree_map(assemble, local_tree)
