"""Jitted train / eval steps: pyramid build → KPFCNN forward → losses, all
on device in ONE compiled program per pair-batch shape.

The reference splits this across DataLoader workers (CPU C++ pyramid),
.to(device) copies, forward, loss and a Python backward step
(lib/trainer.py:216-264,329-397); here the whole thing is a single XLA
computation, vmapped over the pair batch (leading axis B), which is also
the data-parallel sharding axis on a multi-chip mesh.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from pcrcg_tpu.config import Config
from pcrcg_tpu.data.pair import PairBatch
from pcrcg_tpu.losses import LossInputs, metric_loss
from pcrcg_tpu.ops.pyramid import build_pyramid_cfg
from pcrcg_tpu.train.state import TrainState


def forward_pair(model, variables, cfg: Config, points, masks, features, images=None,
                 with_overflow: bool = False):
    """One pair: points [2,N,3], masks [2,N], features [2,N,Cin]; ``images``
    is the optional dict consumed by models.pcrcg.PCRCG's lift.

    ``with_overflow`` additionally returns the per-level voxel-budget
    overflow counts (ops/pyramid.py) so training can surface silent
    point drops (the C++ ``max_p`` cap analog, grid_subsampling.cpp:
    109-211) in per-step stats."""
    if with_overflow:
        pyramid, overflow = build_pyramid_cfg(cfg, points, masks, with_overflow=True)
    else:
        pyramid = build_pyramid_cfg(cfg, points, masks)
    if images is not None:
        out = model.apply(variables, pyramid, features, images)
    else:
        out = model.apply(variables, pyramid, features)
    if with_overflow:
        return out, pyramid, overflow
    return out, pyramid


def pair_loss(
    model, variables, cfg: Config, key, points, masks, features, rot, trans,
    images=None, raw_points=None,
):
    out, pyramid, overflow = forward_pair(
        model, variables, cfg, points, masks, features, images,
        with_overflow=True,
    )
    # The loss geometry: pre-augmentation clouds when provided (KITTI
    # protocol, datasets/kitti.py:17-19), else the model-input clouds.
    loss_pts = points if raw_points is None else raw_points
    inputs = LossInputs(
        src_pcd=loss_pts[0],
        tgt_pcd=loss_pts[1],
        src_mask=masks[0],
        tgt_mask=masks[1],
        rot=rot,
        trans=trans,
        src_feats=out["feats_f"][0],
        tgt_feats=out["feats_f"][1],
        scores_overlap=jnp.concatenate([out["scores_overlap"][0], out["scores_overlap"][1]]),
        scores_saliency=jnp.concatenate([out["scores_saliency"][0], out["scores_saliency"][1]]),
    )
    extras = {}
    if cfg.node_overlap:
        extras["node_overlap_score_pred"] = out["node_overlap_score_pred"]
        extras["nodes"] = pyramid.points[-1]
        extras["node_masks"] = pyramid.masks[-1]
    if cfg.quaternion:
        from pcrcg_tpu.geom import so3

        extras["quaternion_pred"] = out["quaternion_pred"]
        extras["trans_pred"] = out["trans_pred"]
        extras["quaternion_gt"] = so3.quaternion_from_matrix(rot)
    stats = metric_loss(inputs, cfg, key, extras)
    # Voxel-budget overflow, surfaced every step (VERDICT r4 item 7): any
    # positive value means the grid subsample silently dropped voxels past
    # the level budget for this pair.  The counts are already computed by
    # the subsample's segment reduction — this is free.
    stats["max_overflow"] = jnp.maximum(jnp.max(overflow), 0).astype(jnp.float32)
    return stats


def _stats_over_pairs(model, variables, cfg: Config, keys, batch: PairBatch,
                      images=None, use_vmap: bool = False):
    """Mean loss stats over the batch.

    Default ``lax.map`` (NOT vmap): the body compiles ONCE and runs per
    pair — no batching rules, so the Pallas scalar-prefetch kernels
    (candidate-DMA KPConv) stay usable; per-pair work is linear in pairs
    anyway (PERF.md: batch=4 was slower than 4x batch=1).  ``use_vmap``
    keeps the program SPMD so GSPMD can partition pairs over the mesh
    'data' axis (and the cloud axis over 'model') — those runs disable
    the un-vmappable tiled kernels (Trainer does this only when the cloud
    axis is active; pure data parallelism uses train_step_dp, which wraps
    the lax.map body in shard_map and keeps the fast kernels)."""
    base = (keys, batch.points, batch.masks, batch.features, batch.rot, batch.trans)
    opt = {"images": images, "raw_points": batch.raw_points}
    present = [k for k, v in opt.items() if v is not None]

    def fn(k, p, m, f, r, t, *rest):
        kw = dict(zip(present, rest))
        return pair_loss(model, variables, cfg, k, p, m, f, r, t, **kw)

    if use_vmap:
        stats = jax.vmap(fn)(*base, *(opt[k] for k in present))
    else:
        stats = jax.lax.map(
            lambda args: fn(*args), (*base, *(opt[k] for k in present))
        )
    # max_* stats reduce with max over the pair batch (a single
    # over-budget pair must stay visible, not be diluted by the mean).
    return {
        k: (jnp.max(v) if k.startswith("max_") else jnp.mean(v))
        for k, v in stats.items()
    }


def batched_stats(model, variables, cfg: Config, key, batch: PairBatch, images=None,
                  sharded: bool = False):
    keys = jax.random.split(key, batch.batch_size)
    return _stats_over_pairs(
        model, variables, cfg, keys, batch, images, use_vmap=sharded
    )


@functools.partial(jax.jit, static_argnames=("model", "cfg", "sharded"))
def train_step(
    model, cfg: Config, state: TrainState, batch: PairBatch, key, images=None,
    sharded: bool = False,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    def loss_fn(params):
        variables = dict(state.variables(), params=params)
        stats = batched_stats(model, variables, cfg, key, batch, images, sharded)
        return stats["total"], stats

    (_, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    new_state = state.apply_gradients(grads)
    return new_state, stats


def _dp_in_specs(batch: PairBatch, images, batch_size: int):
    """shard_map in_specs for (batch, keys, images): every leaf shards its
    leading pair axis on 'data'.  Image dicts must carry the batch axis on
    EVERY leaf (the loader stacks all image keys, intrinsics included) —
    the per-pair lax.map body requires identical leading axes."""
    from jax.sharding import PartitionSpec as P

    batch_specs = jax.tree_util.tree_map(lambda _: P("data"), batch)
    img_specs = None
    if images is not None:
        for k, v in images.items():
            if v.ndim < 1 or v.shape[0] != batch_size:
                raise ValueError(
                    f"images[{k!r}] must have the pair-batch leading axis "
                    f"({batch_size}), got shape {v.shape}"
                )
        img_specs = {k: P("data") for k in images}
    return batch_specs, img_specs


@functools.partial(jax.jit, static_argnames=("model", "cfg", "mesh"))
def train_step_dp(
    model, cfg: Config, state: TrainState, batch: PairBatch, key, mesh,
    images=None,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """Pure data-parallel train step via ``shard_map``: each device runs the
    plain per-pair ``lax.map`` body — so the scalar-prefetch Pallas kernels
    (candidate-DMA KPConv, tiled max-pool) stay usable, unlike the
    GSPMD-vmap path, which cannot batch them — and only the gradient/stat
    ``pmean`` crosses chips (ICI within a host, DCN across hosts).

    Requires the pair batch sharded over the mesh 'data' axis and the train
    state replicated; semantics identical to ``train_step`` (same per-pair
    keys, same mean reduction)."""
    from jax.sharding import PartitionSpec as P

    keys = jax.random.split(key, batch.batch_size)
    batch_specs, img_specs = _dp_in_specs(batch, images, batch.batch_size)
    other_vars = {k: v for k, v in state.variables().items() if k != "params"}

    def shard_fn(params, other, batch_l, keys_l, images_l):
        def loss_fn(p):
            variables = dict(other, params=p)
            stats = _stats_over_pairs(model, variables, cfg, keys_l, batch_l, images_l)
            return stats["total"], stats

        (_, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads = jax.lax.pmean(grads, "data")
        stats = {
            k: (jax.lax.pmax(v, "data") if k.startswith("max_")
                else jax.lax.pmean(v, "data"))
            for k, v in stats.items()
        }
        return grads, stats

    grads, stats = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), batch_specs, P("data"), img_specs),
        out_specs=(P(), P()),
        check_vma=False,
    )(state.params, other_vars, batch, keys, images)
    return state.apply_gradients(grads), stats


@functools.partial(jax.jit, static_argnames=("model", "cfg", "mesh"))
def eval_step_dp(
    model, cfg: Config, state: TrainState, batch: PairBatch, key, mesh,
    images=None,
) -> Dict[str, jnp.ndarray]:
    """Data-parallel eval twin of :func:`train_step_dp`."""
    from jax.sharding import PartitionSpec as P

    keys = jax.random.split(key, batch.batch_size)
    batch_specs, img_specs = _dp_in_specs(batch, images, batch.batch_size)
    variables = state.variables()

    def shard_fn(vars_, batch_l, keys_l, images_l):
        stats = _stats_over_pairs(model, vars_, cfg, keys_l, batch_l, images_l)
        return {
            k: (jax.lax.pmax(v, "data") if k.startswith("max_")
                else jax.lax.pmean(v, "data"))
            for k, v in stats.items()
        }

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), batch_specs, P("data"), img_specs),
        out_specs=P(),
        check_vma=False,
    )(variables, batch, keys, images)


@functools.partial(jax.jit, static_argnames=("model", "cfg", "sharded"))
def eval_step(
    model, cfg: Config, state: TrainState, batch: PairBatch, key, images=None,
    sharded: bool = False,
) -> Dict[str, jnp.ndarray]:
    return batched_stats(model, state.variables(), cfg, key, batch, images, sharded)


@functools.partial(jax.jit, static_argnames=("model", "cfg"))
def infer_step(model, cfg: Config, state: TrainState, batch: PairBatch, images=None):
    """Forward only; returns the per-pair outputs used by pose estimation
    (descriptor/score dumps, reference lib/tester.py:92-102)."""
    def one(args):
        out, _ = forward_pair(model, state.variables(), cfg, *args)
        return out

    if images is not None:
        return jax.lax.map(one, (batch.points, batch.masks, batch.features, images))
    return jax.lax.map(one, (batch.points, batch.masks, batch.features))
