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


def forward_pair(model, variables, cfg: Config, points, masks, features, images=None):
    """One pair: points [2,N,3], masks [2,N], features [2,N,Cin]; ``images``
    is the optional dict consumed by models.pcrcg.PCRCG's lift."""
    pyramid = build_pyramid_cfg(cfg, points, masks)
    if images is not None:
        out = model.apply(variables, pyramid, features, images)
    else:
        out = model.apply(variables, pyramid, features)
    return out, pyramid


def pair_loss(
    model, variables, cfg: Config, key, points, masks, features, rot, trans,
    images=None, raw_points=None,
):
    out, pyramid = forward_pair(model, variables, cfg, points, masks, features, images)
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
    return stats


def batched_stats(model, variables, cfg: Config, key, batch: PairBatch, images=None,
                  sharded: bool = False):
    keys = jax.random.split(key, batch.batch_size)
    base = (keys, batch.points, batch.masks, batch.features, batch.rot, batch.trans)
    opt = {"images": images, "raw_points": batch.raw_points}
    present = [k for k, v in opt.items() if v is not None]

    if sharded:
        # Mesh-sharded batch axis: vmap keeps the program SPMD so GSPMD can
        # partition pairs over 'data' (and the cloud axis over 'model').
        # The candidate-DMA Pallas kernel cannot be vmap-batched — mesh
        # runs set cfg.kpconv_tiled=False (Trainer does this).
        def vfn(k, p, m, f, r, t, *rest):
            kw = dict(zip(present, rest))
            return pair_loss(model, variables, cfg, k, p, m, f, r, t, **kw)

        stats = jax.vmap(vfn)(*base, *(opt[k] for k in present))
        return jax.tree_util.tree_map(jnp.mean, stats)

    def fn(args):
        k, p, m, f, r, t, *rest = args
        kw = dict(zip(present, rest))
        return pair_loss(model, variables, cfg, k, p, m, f, r, t, **kw)

    # lax.map, not vmap: the body compiles ONCE and runs per pair — no
    # batching rules, so the Pallas scalar-prefetch kernels (candidate-DMA
    # KPConv) stay usable; per-pair work is linear in pairs anyway
    # (PERF.md: batch=4 was slower than 4x batch=1).
    stats = jax.lax.map(fn, (*base, *(opt[k] for k in present)))
    return jax.tree_util.tree_map(jnp.mean, stats)


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
