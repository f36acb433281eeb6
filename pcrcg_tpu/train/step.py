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
from pcrcg_tpu.models.kpfcnn import KPFCNN
from pcrcg_tpu.ops.pyramid import build_pyramid
from pcrcg_tpu.train.state import TrainState


def forward_pair(model: KPFCNN, variables, cfg: Config, points, masks, features):
    """One pair: points [2,N,3], masks [2,N], features [2,N,Cin]."""
    pyramid = build_pyramid(
        points, masks, cfg.budgets, cfg.first_subsampling_dl, cfg.conv_radius
    )
    out = model.apply(variables, pyramid, features)
    return out, pyramid


def pair_loss(model, variables, cfg: Config, key, points, masks, features, rot, trans):
    out, pyramid = forward_pair(model, variables, cfg, points, masks, features)
    inputs = LossInputs(
        src_pcd=points[0],
        tgt_pcd=points[1],
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
    if cfg.quaternion:
        from pcrcg_tpu.geom import so3

        extras["quaternion_pred"] = out["quaternion_pred"]
        extras["trans_pred"] = out["trans_pred"]
        extras["quaternion_gt"] = so3.quaternion_from_matrix(rot)
    stats = metric_loss(inputs, cfg, key, extras)
    return stats


def batched_stats(model, params, constants, cfg: Config, key, batch: PairBatch):
    variables = {"params": params, "constants": constants}
    keys = jax.random.split(key, batch.batch_size)
    stats = jax.vmap(
        lambda k, p, m, f, r, t: pair_loss(model, variables, cfg, k, p, m, f, r, t)
    )(keys, batch.points, batch.masks, batch.features, batch.rot, batch.trans)
    return jax.tree_util.tree_map(jnp.mean, stats)


@functools.partial(jax.jit, static_argnames=("model", "cfg"))
def train_step(
    model: KPFCNN, cfg: Config, state: TrainState, batch: PairBatch, key
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    def loss_fn(params):
        stats = batched_stats(model, params, state.constants, cfg, key, batch)
        return stats["total"], stats

    (_, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    new_state = state.apply_gradients(grads)
    return new_state, stats


@functools.partial(jax.jit, static_argnames=("model", "cfg"))
def eval_step(
    model: KPFCNN, cfg: Config, state: TrainState, batch: PairBatch, key
) -> Dict[str, jnp.ndarray]:
    return batched_stats(model, state.params, state.constants, cfg, key, batch)


@functools.partial(jax.jit, static_argnames=("model", "cfg"))
def infer_step(model: KPFCNN, cfg: Config, state: TrainState, batch: PairBatch):
    """Forward only; returns the per-pair outputs used by pose estimation
    (descriptor/score dumps, reference lib/tester.py:92-102)."""
    def one(points, masks, features):
        out, _ = forward_pair(model, state.variables(), cfg, points, masks, features)
        return out

    return jax.vmap(one)(batch.points, batch.masks, batch.features)
