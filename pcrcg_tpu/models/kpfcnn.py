"""KPFCNN: KPConv encoder–decoder with overlap-attention bottleneck.

Capability parity with reference models/architectures.py:35-610 (encoder
block list construction :62-101, bottleneck+GNN :103-112, decoder
bookkeeping :115-151, forward :516-582), masked static-shape layout:
features [2, N_ℓ, C] over the (src, tgt) cloud axis with per-level masks.

Fidelity notes (SURVEY.md §7 trap-list):
* decoder input = [raw overlap score, saliency, gnn feats] → gnn_dim + 2;
* saliency temperature = exp(ε) + 0.03 with learnable ε init −5;
* final outputs: L2-normalized descriptors (final_feats_dim), overlap and
  saliency after sigmoid→clamp→NaN-scrub;
* skip features are captured BEFORE each strided block.
"""
from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pcrcg_tpu.config import Config
from pcrcg_tpu.models.blocks import (
    LastUnaryBlock,
    ResnetBottleneckBlock,
    SimpleBlock,
    UnaryBlock,
    closest_pool,
    make_dense,
)
from pcrcg_tpu.models.gcn import GCN
from pcrcg_tpu.models.kpconv import resolve_kpconv_impl
from pcrcg_tpu.ops.masked import masked_softmax
from pcrcg_tpu.ops.pyramid import Pyramid


@dataclasses.dataclass(frozen=True)
class BlockPlan:
    kind: str  # 'simple' | 'resnetb' | 'unary' | 'last_unary' | 'upsample'
    in_dim: int
    out_dim: int
    layer: int  # pyramid level of the block's supports
    radius: float
    strided: bool
    kp_seed: int
    deformable: bool = False  # 'deform' in the block name (blocks.py:569,635)


@dataclasses.dataclass(frozen=True)
class ArchitecturePlan:
    encoder: Tuple[BlockPlan, ...]
    decoder: Tuple[BlockPlan, ...]
    encoder_skips: Tuple[int, ...]  # encoder block indices whose INPUT is saved
    decoder_concats: Tuple[int, ...]  # decoder block indices that pop a skip
    bottleneck_dim: int


def plan_architecture(config: Config) -> ArchitecturePlan:
    """Static replication of the reference's constructor bookkeeping
    (architectures.py:62-151)."""
    r = config.first_subsampling_dl * config.conv_radius
    in_dim = config.in_feats_dim
    out_dim = config.first_feats_dim
    layer = 0
    kp_seed = 0

    encoder: List[BlockPlan] = []
    encoder_skips: List[int] = []
    skip_dims: List[int] = []
    arch = config.architecture
    start_i = 0
    for block_i, block in enumerate(arch):
        if any(t in block for t in ("pool", "strided", "upsample", "global")):
            encoder_skips.append(block_i)
            skip_dims.append(in_dim)
        if "upsample" in block:
            start_i = block_i
            break
        strided = "strided" in block
        kind = "simple" if "simple" in block else "resnetb"
        encoder.append(
            BlockPlan(kind, in_dim, out_dim, layer, r, strided, kp_seed,
                      deformable="deform" in block)
        )
        kp_seed += 1
        in_dim = out_dim // 2 if "simple" in block else out_dim
        if strided or "pool" in block:
            layer += 1
            r *= 2
            out_dim *= 2

    bottleneck_dim = in_dim
    decoder: List[BlockPlan] = []
    decoder_concats: List[int] = []
    out_dim = config.gnn_feats_dim + 2
    in_dim = out_dim
    for block_i, block in enumerate(arch[start_i:]):
        if block_i > 0 and "upsample" in arch[start_i + block_i - 1]:
            in_dim += skip_dims[layer]
            decoder_concats.append(block_i)
        if block == "unary":
            decoder.append(BlockPlan("unary", in_dim, out_dim, layer, r, False, 0))
        elif block == "last_unary":
            decoder.append(
                BlockPlan("last_unary", in_dim, config.final_feats_dim + 2, layer, r, False, 0)
            )
        elif "upsample" in block:
            decoder.append(BlockPlan("upsample", in_dim, out_dim, layer, r, False, 0))
        else:
            raise ValueError(f"Unsupported decoder block: {block}")
        in_dim = out_dim
        if "upsample" in block:
            layer -= 1
            r *= 0.5
            out_dim = out_dim // 2

    return ArchitecturePlan(
        tuple(encoder), tuple(decoder), tuple(encoder_skips), tuple(decoder_concats), bottleneck_dim
    )


def masked_l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-24) -> jnp.ndarray:
    """L2 normalize with a smooth guard: all-zero rows (pads) map to zero
    with FINITE gradients (x/max(|x|,ε) has a NaN cotangent at exactly 0,
    which would poison every training step through the pad rows)."""
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(sq + eps)


class KPFCNN(nn.Module):
    """Forward over one pair.  Inputs: ``pyramid`` (see ops/pyramid.py) and
    ``features`` [2, N₀, in_feats_dim].  Returns a dict with:
    feats_f [2, N₀, final_feats_dim] (L2-normalized), scores_overlap [2,N₀],
    scores_saliency [2,N₀], plus bottleneck extras for aux heads."""

    config: Config

    @nn.compact
    def __call__(self, pyramid: Pyramid, features: jnp.ndarray):
        cfg = self.config
        plan = plan_architecture(cfg)
        cdtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        kp_kwargs = dict(
            num_kernel_points=cfg.num_kernel_points,
            influence=cfg.KP_influence,
            aggregation=cfg.aggregation_mode,
            fixed=cfg.fixed_kernel_points,
            impl=resolve_kpconv_impl(cfg.kpconv_impl),
            tiled_meta_tile=cfg.budgets.search_tile,
            tiled_feat_limbs=cfg.tiled_feat_limbs,
        )
        extent_ratio = cfg.KP_extent / cfg.conv_radius

        # 1. joint encoder
        # XLA path: per-level relative neighbor coordinates, gathered ONCE
        # and shared by every block at the level (TPU gathers are
        # latency-bound; the reference re-gathers inside each KPConv,
        # blocks.py:269-275).  The fused path gathers coords together with
        # each block's features in ONE gather (models/kpconv.py), so the
        # shared precompute would only add gathers there.
        from pcrcg_tpu.ops.masked import PAD_COORD, pad_gather

        fused_path = (
            resolve_kpconv_impl(cfg.kpconv_impl) == "fused"
            and jax.default_backend() == "tpu"
        )

        def rel_coords(q_pts, s_pts, neighb):
            def one(q, s, n):
                return pad_gather(s, n, fill_value=PAD_COORD) - q[:, None, :]

            return jax.lax.stop_gradient(jax.vmap(one)(q_pts, s_pts, neighb))

        def conv_tiled_meta(lvl):
            """Tile-local metadata for the candidate-DMA kernel: fused TPU
            path, non-deformable, tiled search available at the level."""
            if not fused_path or not cfg.kpconv_tiled:
                return None
            locals_ = getattr(pyramid, "conv_local", ())
            return locals_[lvl] if lvl < len(locals_) else None

        def pool_tiled_meta(lvl):
            """Same, for the strided blocks' pool search."""
            if not fused_path or not cfg.kpconv_tiled:
                return None
            locals_ = getattr(pyramid, "pool_local", ())
            return locals_[lvl] if lvl < len(locals_) else None

        conv_rel = {}
        pool_rel = {}
        for bp in plan.encoder:
            lvl = bp.layer
            if bp.strided and lvl not in pool_rel and not fused_path:
                # Fused strided blocks gather coords+features+shortcut in
                # ONE merged gather instead.
                pool_rel[lvl] = rel_coords(
                    pyramid.points[lvl + 1], pyramid.points[lvl], pyramid.pools[lvl]
                )
            if not bp.strided and lvl not in conv_rel:
                if conv_tiled_meta(lvl) is not None and not bp.deformable:
                    # Candidate-DMA kernel: rel comes from the DMA'd tiles
                    # in VMEM; a shared rel gather would be pure waste.
                    conv_rel[lvl] = None
                else:
                    conv_rel[lvl] = rel_coords(
                        pyramid.points[lvl], pyramid.points[lvl], pyramid.neighbors[lvl]
                    )

        x = features
        skip_x = []
        for block_i, bp in enumerate(plan.encoder):
            if block_i in plan.encoder_skips:
                skip_x.append(x)
            lvl = bp.layer
            if bp.strided:
                q_pts, q_mask = pyramid.points[lvl + 1], pyramid.masks[lvl + 1]
                neighb = pyramid.pools[lvl]
                rel = pool_rel.get(lvl)
            else:
                q_pts, q_mask = pyramid.points[lvl], pyramid.masks[lvl]
                neighb = pyramid.neighbors[lvl]
                rel = conv_rel.get(lvl)
            s_pts, s_mask = pyramid.points[lvl], pyramid.masks[lvl]
            common = dict(
                in_dim=bp.in_dim,
                out_dim=bp.out_dim,
                radius=bp.radius,
                kp_extent=bp.radius * extent_ratio,
                config_kp=kp_kwargs,
                strided=bp.strided,
                kp_seed=bp.kp_seed,
                dtype=cdtype,
                deformable=bp.deformable,
                modulated=cfg.modulated,
                name=f"encoder_{block_i}",
            )
            if bp.deformable:
                tmeta = None
            elif bp.strided:
                tmeta = pool_tiled_meta(lvl)
            else:
                tmeta = conv_tiled_meta(lvl)
            if bp.kind == "simple":
                # Block 0 over the ones-column input (in_feats_dim 1, no 2D
                # branch): neighbor features == validity bits; skip the
                # latency-bound gather inside KPConv.
                ones_fast = (
                    block_i == 0 and cfg.in_feats_dim == 1 and not cfg.image_feature
                )
                x = SimpleBlock(**common, ones_features=ones_fast)(
                    x, q_pts, s_pts, neighb, q_mask, rel, tiled_meta=tmeta
                )
            else:
                x = ResnetBottleneckBlock(**common)(
                    x, q_pts, s_pts, neighb, q_mask, s_mask, rel,
                    tiled_meta=tmeta,
                )

        # 2. bottleneck projection (reference 'bottle' 1×1 conv, :107)
        mask_c = pyramid.masks[-1]
        pts_c = pyramid.points[-1]
        feats_c = make_dense(cfg.gnn_feats_dim, True, name="bottle")(x)

        # 3. GNN communication between the clouds
        src_feats_c, tgt_feats_c = GCN(
            num_heads=cfg.num_head,
            dim=cfg.gnn_feats_dim,
            k=cfg.dgcnn_k,
            layer_names=cfg.nets,
            query_chunk=cfg.budgets.query_chunk,
            name="gnn",
        )(pts_c[0], pts_c[1], feats_c[0], feats_c[1], mask_c[0], mask_c[1])
        feats_c = jnp.stack([src_feats_c, tgt_feats_c])

        feats_c = make_dense(cfg.gnn_feats_dim, True, name="proj_gnn")(feats_c)
        scores_c_raw = make_dense(1, True, name="proj_score")(feats_c)  # [2,Nc,1]

        feats_gnn_norm = masked_l2_normalize(feats_c)
        feats_gnn_raw = feats_c

        # 4. cross-cloud saliency via temperature softmax (:557-564)
        epsilon = self.param("epsilon", nn.initializers.constant(-5.0), ())
        temperature = jnp.exp(epsilon) + 0.03
        inner = jnp.matmul(feats_gnn_norm[0], feats_gnn_norm[1].T)  # [Ns,Nt]
        s1 = masked_softmax(inner / temperature, mask_c[1][None, :], axis=1) @ scores_c_raw[1]
        s2 = masked_softmax(inner.T / temperature, mask_c[0][None, :], axis=1) @ scores_c_raw[0]
        scores_saliency_c = jnp.stack([s1, s2])  # [2,Nc,1]

        # 5. decoder (scores concatenated ahead of the gnn feats, :565)
        x = jnp.concatenate([scores_c_raw, scores_saliency_c, feats_gnn_raw], axis=-1)
        for block_i, bp in enumerate(plan.decoder):
            if block_i in plan.decoder_concats:
                x = jnp.concatenate([x, skip_x.pop()], axis=-1)
            lvl = bp.layer
            if bp.kind == "upsample":
                x = closest_pool(x, pyramid.upsamples[lvl - 1])
            elif bp.kind == "unary":
                x = UnaryBlock(bp.out_dim, dtype=cdtype, name=f"decoder_{block_i}")(
                    x, pyramid.masks[lvl]
                )
            else:
                x = LastUnaryBlock(bp.out_dim, dtype=cdtype, name=f"decoder_{block_i}")(
                    x, pyramid.masks[lvl]
                )

        d = cfg.final_feats_dim
        feats_f = masked_l2_normalize(x[..., :d])
        scores_overlap = jnp.clip(nn.sigmoid(x[..., d]), 0.0, 1.0)
        scores_saliency = jnp.clip(nn.sigmoid(x[..., d + 1]), 0.0, 1.0)
        # NaN scrub (reference regular_score, :176-179)
        scores_overlap = jnp.nan_to_num(scores_overlap, nan=0.0, posinf=0.0, neginf=0.0)
        scores_saliency = jnp.nan_to_num(scores_saliency, nan=0.0, posinf=0.0, neginf=0.0)

        res = {
            "feats_f": feats_f,
            "scores_overlap": scores_overlap,
            "scores_saliency": scores_saliency,
        }

        if cfg.node_overlap:
            # Super-node overlap head on the gnn features (:546-552).
            node_score = make_dense(1, True, name="node_overlap_predict")(feats_gnn_raw)
            node_score = jnp.clip(nn.sigmoid(node_score[..., 0]), 0.0, 1.0)
            res["node_overlap_score_pred"] = node_score

        if cfg.quaternion:
            # Pose regression head (:160-173, :584-604): MLP over per-point
            # descriptors, mean over points.
            t = feats_f
            for i, width in enumerate((64, 128, 256, 512, 1024)):
                t = nn.relu(make_dense(width, True, name=f"folding1_{i}")(t))
            quat = make_dense(4, True, name="linear1")(t)
            trans = make_dense(3, True, name="linear2")(t)
            quat = masked_l2_normalize(quat)
            valid = jnp.concatenate([pyramid.masks[0][0], pyramid.masks[0][1]])
            flat_q = quat.reshape(-1, 4)
            flat_t = trans.reshape(-1, 3)
            w = valid.astype(flat_q.dtype)[:, None]
            denom = jnp.maximum(jnp.sum(w), 1.0)
            res["quaternion_pred"] = jnp.sum(flat_q * w, axis=0) / denom
            res["trans_pred"] = jnp.sum(flat_t * w, axis=0) / denom

        return res
