"""Kernel-point convolution, TPU-native.

Capability parity with the reference KPConv (models/blocks.py:135-379),
re-expressed as a single fused gather → influence → matmul chain with
static shapes.  Semantics preserved exactly:

* shadow neighbors (index == len(supports)) gather a point at PAD_COORD so
  their influence is 0 and a zero feature row (blocks.py:269,348),
* influence = clamp(1 − d/KP_extent, 0) for 'linear' (blocks.py:326-329),
  gaussian with σ = 0.3·extent (blocks.py:333-335), constant = 1,
* aggregation 'sum' or 'closest' (one-hot of nearest kernel point,
  blocks.py:339-345),
* output divided by the number of neighbors whose gathered feature-sum is
  positive, floored at 1 (blocks.py:369-372 — a heuristic the reference
  relies on; kept verbatim for fidelity).

The per-kernel-point matmul is einsum'd so XLA maps it onto the MXU as one
[N·K, Cin] × [Cin, Cout·?] batched contraction.  Deformable (and modulated)
KPConv (blocks.py:235-316) is implemented below (kpconv_deformable) and
parity-tested against the reference torch op including in-range pruning
(tests/test_reference_parity.py); the shipped configs keep it off
(deformable False, configs/train/indoor.yaml:44), matching the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from pcrcg_tpu.geom.kernel_points import layer_kernel_points
from pcrcg_tpu.ops.masked import PAD_COORD, pad_gather

def resolve_kpconv_impl(impl: str) -> str:
    """'auto' -> the fused Pallas kernel on TPU, plain XLA elsewhere."""
    if impl == "auto":
        return "fused" if jax.default_backend() == "tpu" else "xla"
    return impl


def _kaiming_u5_torch3d(key, shape, dtype=jnp.float32):
    """torch kaiming_uniform_(a=√5) on a [K,Cin,Cout] tensor: torch computes
    fan_in = size(1)·prod(size(2:)) = Cin·Cout, bound = √(1/fan_in)."""
    bound = (1.0 / (shape[1] * shape[2])) ** 0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def kpconv(
    q_pts: jnp.ndarray,
    s_pts: jnp.ndarray,
    neighb_inds: jnp.ndarray,
    x: jnp.ndarray,
    kernel_points: jnp.ndarray,
    weights: jnp.ndarray,
    kp_extent: float,
    influence: str = "linear",
    aggregation: str = "sum",
    compute_dtype=jnp.float32,
    neighbors_rel=None,
    ones_features: bool = False,
    impl: str = "xla",
    interpret: bool = False,
    shortcut_x=None,
):
    """q_pts [Nq,3], s_pts [Ns,3], neighb_inds [Nq,H] (pad=Ns), x [Ns,Cin],
    kernel_points [K,3], weights [K,Cin,Cout] -> [Nq,Cout].

    ``neighbors_rel`` [Nq,H,3] (gathered neighbor coords minus query) can be
    precomputed once per pyramid level and shared across every block at that
    level — TPU gathers are latency-bound (~3.5 ns/row measured), so
    repeating the coordinate gather in all 17 blocks costs real time.

    ``impl`` selects the compute path:
      * 'xla'    — K-unrolled VPU reduce + one flattened matmul;
      * 'reduce' — Pallas influence+reduce kernel, matmul in XLA;
      * 'fused'  — merged-gather Pallas kernel: ONE row gather per block
                   fetches [support coords | features] together, influence
                   is computed in-kernel against the query coords, and the
                   whole influence+reduce+matmul chain runs on-chip
                   (ops/kpconv_fused.py).  TPU gathers are latency-bound
                   per ROW regardless of width, so the coordinate gather
                   rides along for free.
    All three preserve the reference semantics exactly.

    ``shortcut_x`` [Ns, C2] (fused path only): extra support features that
    ride the same gather; returns a second output ``max_h shortcut_x[nbr]``
    — the strided resnet block's max-pooled shortcut (zero shadow rows,
    reference models/blocks.py:86-103) without its own gather."""
    on_tpu = jax.default_backend() == "tpu" or interpret

    if impl == "fused" and on_tpu and shortcut_x is not None:
        # MERGED-GATHER path, used for strided blocks: ONE row gather
        # fetches [support coords | conv features | shortcut features]
        # together (gathers are latency-bound per ROW, so the extra width
        # is free), the kernel computes rel against the query coords, and
        # the strided shortcut's max-pool reads the same gather — 1 gather
        # where the XLA path needs 3.  Non-strided blocks stay on the
        # shared-rel fused path below: their rel gather is amortized
        # across every block of the level, so merging would ADD gathers.
        from pcrcg_tpu.ops.kpconv_fused import kpconv_fused_merged_ad

        # The merged array carries GEOMETRY, so it stays f32 regardless of
        # compute_dtype — bf16 coords would quantize rel to ~1 cm at room
        # scale.  The kernel accumulates in f32 either way.
        if ones_features:
            feats = jnp.ones((x.shape[0], 1), jnp.float32)
            c1 = 1
        else:
            feats = x.astype(jnp.float32)
            c1 = x.shape[-1]
        parts = [
            jnp.pad(s_pts, ((0, 0), (0, 5))).astype(jnp.float32),  # coords+pad
            feats,
            shortcut_x.astype(jnp.float32),
        ]
        base = jnp.concatenate(parts, axis=-1)  # [Ns, 8+C1+C2]
        nxc = pad_gather(base, neighb_inds, fill_value=0.0)  # ONE gather
        # Only [coords | conv features] enter the kernel.
        nxc_t = jnp.transpose(nxc[:, :, : 8 + c1], (1, 2, 0))
        w8 = jnp.concatenate(
            [jnp.zeros((weights.shape[0], 8, weights.shape[2]), compute_dtype),
             weights.astype(compute_dtype)],
            axis=1,
        )
        out, neighbor_num = kpconv_fused_merged_ad(
            jax.lax.stop_gradient(q_pts), nxc_t, kernel_points, w8,
            float(kp_extent), influence, aggregation, interpret,
            not ones_features,  # ones features: constants, no dnx
        )
        neighbor_num = jax.lax.stop_gradient(neighbor_num)
        out = out / neighbor_num[:, None].astype(out.dtype)
        # Max-pooled shortcut from the shared gather (shadow rows are
        # zero, exactly the reference's zero shadow feature + max).
        shortcut = jnp.max(nxc[:, :, 8 + c1:], axis=1).astype(jnp.float32)
        return out, shortcut

    if neighbors_rel is None:
        # Gather neighbor coordinates; shadow index -> PAD_COORD (far away).
        neighbors = pad_gather(s_pts, neighb_inds, fill_value=PAD_COORD)
        neighbors = neighbors - q_pts[:, None, :]  # [Nq,H,3]
    else:
        neighbors = neighbors_rel

    if ones_features:
        # Fast path for the ones-column input (in_feats_dim == 1): the
        # gathered feature equals "neighbor index is real" — no gather.
        neighb_x0 = (neighb_inds < x.shape[0]).astype(x.dtype)[..., None]
    else:
        neighb_x0 = None

    if impl == "fused" and on_tpu:
        from pcrcg_tpu.ops.kpconv_fused import kpconv_fused_ad

        if neighb_x0 is not None:
            nx = neighb_x0.astype(jnp.float32)
        else:
            nx = pad_gather(x, neighb_inds, fill_value=0.0).astype(compute_dtype)
        nx_t = jnp.transpose(nx, (1, 2, 0))  # [H,C,N]
        out, neighbor_num = kpconv_fused_ad(
            jax.lax.stop_gradient(neighbors), nx_t, kernel_points,
            weights.astype(compute_dtype), float(kp_extent), influence,
            aggregation, interpret,
            neighb_x0 is None,  # ones features: constants, no dnx
        )
        neighbor_num = jax.lax.stop_gradient(neighbor_num)
        return out / neighbor_num[:, None].astype(out.dtype)

    if (
        impl == "reduce"
        and aggregation == "sum"
        and influence in ("linear", "gaussian", "constant")
        and x.shape[-1] >= 8
        and on_tpu
    ):
        from pcrcg_tpu.ops.kpconv_pallas import kpconv_weighted_reduce

        nx = neighb_x0 if neighb_x0 is not None else pad_gather(x, neighb_inds, 0.0)
        weighted, neighbor_num = kpconv_weighted_reduce(
            neighbors, nx, kernel_points, kp_extent, influence,
            out_dtype=compute_dtype, interpret=interpret,
        )  # weighted [K,Nq,C]
        out = jnp.einsum(
            "knc,kcd->nd",
            weighted,
            weights.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        return out / neighbor_num[:, None].astype(out.dtype)

    # Squared distances to each kernel point [Nq,H,K].
    diff = neighbors[:, :, None, :] - kernel_points[None, None, :, :]
    sq_distances = jnp.sum(diff * diff, axis=-1)

    if influence == "constant":
        all_weights = jnp.ones_like(sq_distances)
    elif influence == "linear":
        all_weights = jnp.maximum(1.0 - jnp.sqrt(sq_distances) / kp_extent, 0.0)
    elif influence == "gaussian":
        sigma = kp_extent * 0.3
        all_weights = jnp.exp(-sq_distances / (2.0 * sigma**2 + 1e-9))
    else:
        raise ValueError(f"Unknown KP influence: {influence}")

    if aggregation == "closest":
        one_hot = jax.nn.one_hot(jnp.argmin(sq_distances, axis=2), kernel_points.shape[0])
        all_weights = all_weights * one_hot
    elif aggregation != "sum":
        raise ValueError(f"Unknown aggregation mode: {aggregation}")

    if neighb_x0 is not None:
        # (reference indoor.py:179-180 — pad SUPPORT rows sit at PAD_COORD
        # and are never within radius, so idx < Ns suffices.)
        neighb_x = neighb_x0
    else:
        # Gather neighbor features; shadow rows are zero.
        neighb_x = pad_gather(x, neighb_inds, fill_value=0.0)  # [Nq,H,Cin]

    # Influence-weighted sum over neighbors.  NOT an einsum 'nhk,nhc->nkc':
    # that is a batch of Nq tiny [K,H]@[H,C] matmuls, which XLA pads to
    # 128x128 MXU tiles at ~2% utilization (measured ~3 s/pair on v5e).
    # Unrolling K keeps it a fused VPU multiply-reduce with no [N,H,K,C]
    # intermediate.
    k_count = kernel_points.shape[0]
    # Feature path in compute_dtype (bf16 halves the gather/reduce HBM
    # traffic); geometry (distances/influence) stays f32 above.
    neighb_x_c = neighb_x.astype(compute_dtype)
    all_weights_c = all_weights.astype(compute_dtype)
    weighted = jnp.stack(
        [
            jnp.sum(
                all_weights_c[:, :, k][:, :, None] * neighb_x_c,
                axis=1,
                dtype=jnp.float32,  # f32 accumulation over the H neighbors
            )
            for k in range(k_count)
        ],
        axis=1,
    ).astype(compute_dtype)  # [Nq,K,Cin]

    # One LARGE matmul over the flattened (K·Cin) axis — MXU-friendly,
    # f32 accumulation.
    out = jnp.matmul(
        weighted.reshape(weighted.shape[0], -1),
        weights.astype(compute_dtype).reshape(-1, weights.shape[-1]),
        preferred_element_type=jnp.float32,
    )

    # Reference normalization heuristic (blocks.py:369-372).
    neighbor_num = jnp.sum(jnp.sum(neighb_x, axis=-1) > 0.0, axis=-1)
    neighbor_num = jnp.maximum(neighbor_num, 1)
    return out / neighbor_num[:, None].astype(out.dtype)


def kpconv_deformable(
    q_pts: jnp.ndarray,
    s_pts: jnp.ndarray,
    neighb_inds: jnp.ndarray,
    x: jnp.ndarray,
    kernel_points: jnp.ndarray,
    weights: jnp.ndarray,
    kp_extent: float,
    offsets: jnp.ndarray,
    modulations: jnp.ndarray | None = None,
    influence: str = "linear",
    aggregation: str = "sum",
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Deformable KPConv forward (reference models/blocks.py:235-372 with
    deformable=True): per-query kernel points ``kernel_points + offsets``
    ([Nq,K,3], offsets already scaled by KP_extent), optional per-query
    ``modulations`` [Nq,K] multiplying the weighted features.

    The reference's dynamic in-range pruning (blocks.py:292-316) keeps only
    neighbors within KP_extent of ANY deformed kernel point and re-pads the
    rest to shadow.  Static-shape equivalent: zero the influence rows of
    out-of-range neighbors and exclude them from the neighbor-count
    normalization — identical output for every influence/aggregation mode.

    Dense XLA path only: per-query kernel points defeat the shared-KP
    Pallas kernels, and deformable blocks are disabled in every shipped
    reference config (configs/train/indoor.yaml:44) — completeness, not a
    hot path."""
    neighbors = pad_gather(s_pts, neighb_inds, fill_value=PAD_COORD)
    neighbors = neighbors - q_pts[:, None, :]  # [Nq,H,3]

    # [Nq,H,K] distances to the DEFORMED kernel points.
    deformed_kp = kernel_points[None, :, :] + offsets  # [Nq,K,3]
    diff = neighbors[:, :, None, :] - deformed_kp[:, None, :, :]
    sq_distances = jnp.sum(diff * diff, axis=-1)

    in_range = jnp.any(sq_distances < kp_extent**2, axis=2)  # [Nq,H]

    if influence == "constant":
        all_weights = jnp.ones_like(sq_distances)
    elif influence == "linear":
        all_weights = jnp.maximum(1.0 - jnp.sqrt(sq_distances) / kp_extent, 0.0)
    elif influence == "gaussian":
        sigma = kp_extent * 0.3
        all_weights = jnp.exp(-sq_distances / (2.0 * sigma**2 + 1e-9))
    else:
        raise ValueError(f"Unknown KP influence: {influence}")

    if aggregation == "closest":
        one_hot = jax.nn.one_hot(jnp.argmin(sq_distances, axis=2), kernel_points.shape[0])
        all_weights = all_weights * one_hot
    elif aggregation != "sum":
        raise ValueError(f"Unknown aggregation mode: {aggregation}")

    # Out-of-range neighbors become shadow in the reference; mask them out.
    all_weights = all_weights * in_range[:, :, None].astype(all_weights.dtype)

    neighb_x = pad_gather(x, neighb_inds, fill_value=0.0)  # [Nq,H,Cin]

    k_count = kernel_points.shape[0]
    neighb_x_c = neighb_x.astype(compute_dtype)
    all_weights_c = all_weights.astype(compute_dtype)
    weighted = jnp.stack(
        [
            jnp.sum(
                all_weights_c[:, :, k][:, :, None] * neighb_x_c,
                axis=1,
                dtype=jnp.float32,
            )
            for k in range(k_count)
        ],
        axis=1,
    )  # [Nq,K,Cin] f32

    if modulations is not None:
        weighted = weighted * modulations[:, :, None].astype(weighted.dtype)

    out = jnp.matmul(
        weighted.astype(compute_dtype).reshape(weighted.shape[0], -1),
        weights.astype(compute_dtype).reshape(-1, weights.shape[-1]),
        preferred_element_type=jnp.float32,
    )

    # Normalization over the PRUNED neighbor set (blocks.py:292-316 +
    # 369-372: shadow-replaced rows gather zero features, so the count sees
    # only in-range real neighbors).
    feat_sum = jnp.sum(neighb_x, axis=-1) * in_range.astype(neighb_x.dtype)
    neighbor_num = jnp.maximum(jnp.sum(feat_sum > 0.0, axis=-1), 1)
    return out / neighbor_num[:, None].astype(out.dtype)


class KPConv(nn.Module):
    """Linen wrapper; applies over a leading cloud axis via vmap.

    Each instance draws its own rotated/jittered kernel disposition, fixed
    after init (reference kernel_points.py:433-468, blocks.py:226) — the
    per-layer ``seed`` reproduces "every layer has a different kernel".
    """

    in_channels: int
    out_channels: int
    radius: float  # block radius: kernel points live at ~0.66·radius
    kp_extent: float
    num_kernel_points: int = 15
    influence: str = "linear"
    aggregation: str = "sum"
    fixed: str = "center"
    seed: int = 0
    compute_dtype: object = jnp.float32
    ones_features: bool = False
    impl: str = "xla"
    deformable: bool = False
    modulated: bool = False

    tiled_meta_tile: int = 128
    # bf16 limbs for feature rows in the candidate-DMA kernel (1 = fast
    # single-limb, 2 = hi/lo exact-ish; see ops/kpconv_tiled.py).
    tiled_feat_limbs: int = 2

    @nn.compact
    def __call__(self, q_pts, s_pts, neighb_inds, x, neighbors_rel=None,
                 shortcut_x=None, tiled_meta=None):
        """q_pts [B,Nq,3], s_pts [B,Ns,3], neighb_inds [B,Nq,H], x [B,Ns,C],
        optional shared neighbors_rel [B,Nq,H,3]; ``shortcut_x`` [B,Ns,C2]
        additionally returns the max-pooled shortcut features (fused path:
        from the same gather; otherwise a plain max_pool).

        ``tiled_meta`` = (lidx [B, Gp·128, H], tiles [B, Gp, M]) from the
        tile-pruned search routes the conv through the candidate-DMA
        kernel (ops/kpconv_tiled.py — zero HBM row gathers) on the fused
        TPU path."""
        kp = layer_kernel_points(
            self.radius, self.num_kernel_points, fixed=self.fixed, seed=self.seed
        )
        kernel_points = self.variable(
            "constants", "kernel_points", lambda: jnp.asarray(kp)
        ).value
        weights = self.param(
            "weights",
            _kaiming_u5_torch3d,
            (self.num_kernel_points, self.in_channels, self.out_channels),
        )

        if self.deformable:
            # Offset generation (reference blocks.py:179-199, 235-260): a
            # rigid sub-KPConv over the SAME inputs predicts per-query
            # kernel-point offsets (3K channels; +K modulation logits when
            # modulated), plus a zero-init bias.  The sub-conv draws its
            # own kernel disposition, exactly like the reference's nested
            # KPConv construction.
            k = self.num_kernel_points
            offset_dim = (3 + 1) * k if self.modulated else 3 * k
            offset_feats = KPConv(
                in_channels=self.in_channels,
                out_channels=offset_dim,
                radius=self.radius,
                kp_extent=self.kp_extent,
                num_kernel_points=k,
                influence=self.influence,
                aggregation=self.aggregation,
                fixed=self.fixed,
                seed=self.seed + 7919,  # independent disposition
                compute_dtype=self.compute_dtype,
                ones_features=self.ones_features,
                impl=self.impl,
                name="offset_conv",
            )(q_pts, s_pts, neighb_inds, x, neighbors_rel)
            offset_bias = self.param(
                "offset_bias", nn.initializers.zeros, (offset_dim,)
            )
            offset_feats = offset_feats + offset_bias
            unscaled = offset_feats[..., : 3 * k].reshape(*offset_feats.shape[:-1], k, 3)
            offsets = unscaled * self.kp_extent  # (blocks.py:258-260)
            modulations = (
                2.0 * jax.nn.sigmoid(offset_feats[..., 3 * k:])
                if self.modulated
                else None
            )

            def deform_one(q, s, n, f, off, mod):
                return kpconv_deformable(
                    q, s, n, f, kernel_points, weights, self.kp_extent,
                    off, mod, self.influence, self.aggregation,
                    compute_dtype=self.compute_dtype,
                )

            if modulations is None:
                out = jax.vmap(lambda q, s, n, f, off: deform_one(q, s, n, f, off, None))(
                    q_pts, s_pts, neighb_inds, x, offsets
                )
            else:
                out = jax.vmap(deform_one)(
                    q_pts, s_pts, neighb_inds, x, offsets, modulations
                )
            if shortcut_x is not None:
                from pcrcg_tpu.models.blocks import max_pool

                return out, max_pool(shortcut_x, neighb_inds)
            return out

        def conv_one(q, s, n, f, rel=None, sx=None):
            return kpconv(
                q, s, n, f, kernel_points, weights,
                self.kp_extent, self.influence, self.aggregation,
                compute_dtype=self.compute_dtype, neighbors_rel=rel,
                ones_features=self.ones_features, impl=self.impl,
                shortcut_x=sx,
            )

        if (
            tiled_meta is not None
            and shortcut_x is None
            and resolve_kpconv_impl(self.impl) == "fused"
            and jax.default_backend() == "tpu"
        ):
            from pcrcg_tpu.ops.kpconv_tiled import kpconv_tiled_ad

            lidx, tiles = tiled_meta
            feats = (
                jnp.ones((x.shape[0], x.shape[1], 1), jnp.float32)
                if self.ones_features else x.astype(jnp.float32)
            )
            b, nq = q_pts.shape[:2]
            ns = s_pts.shape[1]
            mt = self.tiled_meta_tile
            if nq % 128 == 0 and ns % mt == 0 and lidx.shape[1] == nq:
                # Stack the B clouds into ONE point set with per-cloud tile
                # ranges (Z-order holds within each cloud; tile ids offset
                # by the cloud's tile base) — one Pallas dispatch instead
                # of B (scalar-prefetch grids don't vmap).  gidx is only a
                # shape-carrier for the custom VJP (the backward scatters
                # via lidx/tiles), so a plain reshape suffices.
                n_per = ns // mt
                boff = (jnp.arange(b, dtype=tiles.dtype) * n_per)[:, None, None]
                out, ncount = kpconv_tiled_ad(
                    q_pts.reshape(b * nq, 3),
                    s_pts.reshape(b * ns, 3),
                    feats.reshape(b * ns, -1),
                    lidx.reshape(b * nq, -1),
                    (tiles + boff).reshape(-1, tiles.shape[2]),
                    neighb_inds.reshape(b * nq, -1),
                    kernel_points, weights,
                    float(self.kp_extent), self.influence, self.aggregation,
                    tile=mt, feat_limbs=self.tiled_feat_limbs,
                )
                out = out / ncount[:, None].astype(out.dtype)
                return out.reshape(b, nq, -1)
            outs = []
            for bi in range(b):  # explicit loop: scalar-prefetch
                out_b, nn_b = kpconv_tiled_ad(  # grids don't vmap
                    q_pts[bi], s_pts[bi], feats[bi], lidx[bi], tiles[bi],
                    neighb_inds[bi], kernel_points, weights,
                    float(self.kp_extent), self.influence, self.aggregation,
                    tile=mt, feat_limbs=self.tiled_feat_limbs,
                )
                outs.append(out_b / nn_b[:, None].astype(out_b.dtype))
            return jnp.stack(outs)

        if shortcut_x is not None and resolve_kpconv_impl(self.impl) == "fused" \
                and (jax.default_backend() == "tpu"):
            return jax.vmap(lambda q, s, n, f, sx: conv_one(q, s, n, f, None, sx))(
                q_pts, s_pts, neighb_inds, x, shortcut_x
            )
        if shortcut_x is not None:
            from pcrcg_tpu.models.blocks import max_pool

            if neighbors_rel is not None:
                out = jax.vmap(conv_one)(q_pts, s_pts, neighb_inds, x, neighbors_rel)
            else:
                out = jax.vmap(conv_one)(q_pts, s_pts, neighb_inds, x)
            return out, max_pool(shortcut_x, neighb_inds)
        if neighbors_rel is not None:
            return jax.vmap(conv_one)(q_pts, s_pts, neighb_inds, x, neighbors_rel)
        return jax.vmap(conv_one)(q_pts, s_pts, neighb_inds, x)
