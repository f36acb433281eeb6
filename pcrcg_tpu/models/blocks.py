"""KPFCNN network blocks (unary / simple / resnet-bottleneck / pooling),
masked static-shape re-design of reference models/blocks.py:387-723.

Data layout: features are [B, N, C] with B the cloud axis (src/tgt) and a
boolean ``mask`` [B, N] marking real points.  The reference's
"BatchNormBlock" is actually torch InstanceNorm1d over the full stacked
src+tgt point dimension with no affine (blocks.py:448,459-462); here that
is a masked per-channel normalization over BOTH the cloud and point axes
jointly, which matches the reference's joint-stack statistics exactly.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from pcrcg_tpu.models.kpconv import KPConv
from pcrcg_tpu.ops.masked import masked_instance_norm, pad_gather


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default weight init on flax kernel shape [in, out]."""
    bound = (1.0 / shape[0]) ** 0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def make_dense(
    features: int, use_bias: bool, name: Optional[str] = None, dtype=None
) -> nn.Dense:
    """nn.Dense with torch nn.Linear default init (U(±1/√fan_in) for kernel
    and bias) so fresh-init training dynamics match the reference.
    ``dtype`` is the computation dtype (params stay f32)."""
    return nn.Dense(
        features,
        use_bias=use_bias,
        dtype=dtype,
        kernel_init=torch_linear_kernel_init,
        bias_init=nn.initializers.zeros,
        name=name,
    )


def max_pool(x: jnp.ndarray, inds: jnp.ndarray) -> jnp.ndarray:
    """x [B,Ns,C], inds [B,Nq,H] (pad=Ns) -> [B,Nq,C].  Shadow neighbors
    contribute a zero row, exactly the reference's zero shadow feature +
    max (blocks.py:86-103)."""
    gathered = jax.vmap(pad_gather, in_axes=(0, 0, None))(x, inds, 0.0)
    return jnp.max(gathered, axis=2)


def closest_pool(x: jnp.ndarray, inds: jnp.ndarray) -> jnp.ndarray:
    """Pool from the nearest neighbor (first column — neighbor lists are
    distance-sorted; reference blocks.py:71-83)."""
    return jax.vmap(pad_gather, in_axes=(0, 0, None))(x, inds[:, :, 0], 0.0)


def global_average(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked mean over points: x [B,N,C], mask [B,N] -> [B,C]
    (reference blocks.py:106-125)."""
    m = mask.astype(x.dtype)[..., None]
    return jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)


class NormBlock(nn.Module):
    """Reference BatchNormBlock (blocks.py:433-470): InstanceNorm1d over the
    joint src+tgt stack when use_norm, else a learned bias."""

    dim: int
    use_norm: bool = True

    @nn.compact
    def __call__(self, x, mask):
        if self.use_norm:
            return masked_instance_norm(x, mask, axis=(0, 1))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return x + bias


class UnaryBlock(nn.Module):
    """Linear (no bias) → norm → LeakyReLU(0.1) (blocks.py:473-508)."""

    out_dim: int
    use_norm: bool = True
    no_relu: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x, mask):
        x = make_dense(self.out_dim, use_bias=False, name="mlp", dtype=self.dtype)(x)
        x = x.astype(jnp.float32)
        x = NormBlock(self.out_dim, self.use_norm, name="norm")(x, mask)
        if not self.no_relu:
            x = nn.leaky_relu(x, 0.1)
        return x


class LastUnaryBlock(nn.Module):
    """Bare linear, no norm/activation (blocks.py:511-533)."""

    out_dim: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, mask):
        out = make_dense(self.out_dim, use_bias=False, name="mlp", dtype=self.dtype)(x)
        return out.astype(jnp.float32)


class SimpleBlock(nn.Module):
    """KPConv(out/2) → norm → LeakyReLU(0.1) (blocks.py:536-590)."""

    in_dim: int
    out_dim: int
    radius: float
    kp_extent: float
    config_kp: dict
    strided: bool = False
    kp_seed: int = 0
    dtype: object = None
    ones_features: bool = False
    deformable: bool = False
    modulated: bool = False

    @nn.compact
    def __call__(self, x, q_pts, s_pts, neighb_inds, q_mask, neighbors_rel=None,
                 tiled_meta=None):
        half = self.out_dim // 2
        x = KPConv(
            in_channels=self.in_dim,
            out_channels=half,
            radius=self.radius,
            kp_extent=self.kp_extent,
            seed=self.kp_seed,
            compute_dtype=self.dtype or jnp.float32,
            ones_features=self.ones_features,
            deformable=self.deformable,
            modulated=self.modulated,
            name="KPConv",
            **self.config_kp,
        )(q_pts, s_pts, neighb_inds, x, neighbors_rel, tiled_meta=tiled_meta)
        x = NormBlock(half, name="norm")(x, q_mask)
        return nn.leaky_relu(x, 0.1)


class ResnetBottleneckBlock(nn.Module):
    """1×1 down → KPConv → 1×1 up, with (max-pooled when strided) shortcut
    (blocks.py:593-678)."""

    in_dim: int
    out_dim: int
    radius: float
    kp_extent: float
    config_kp: dict
    strided: bool = False
    kp_seed: int = 0
    dtype: object = None
    deformable: bool = False
    modulated: bool = False

    @nn.compact
    def __call__(self, x, q_pts, s_pts, neighb_inds, q_mask, s_mask, neighbors_rel=None,
                 tiled_meta=None):
        quarter = self.out_dim // 4
        if self.in_dim != quarter:
            y = UnaryBlock(quarter, name="unary1", dtype=self.dtype)(x, s_mask)
        else:
            y = x
        conv = KPConv(
            in_channels=quarter,
            out_channels=quarter,
            radius=self.radius,
            kp_extent=self.kp_extent,
            seed=self.kp_seed,
            compute_dtype=self.dtype or jnp.float32,
            deformable=self.deformable,
            modulated=self.modulated,
            name="KPConv",
            **self.config_kp,
        )
        if self.strided and tiled_meta is not None:
            # Candidate-DMA path: the conv reads its neighbor rows from
            # the pool search's candidate tiles in VMEM (zero row
            # gathers); the shortcut max-pool still gathers forward but
            # back-propagates through the tile-scatter kernel.
            y = conv(q_pts, s_pts, neighb_inds, y, None, tiled_meta=tiled_meta)
            if jax.default_backend() == "tpu":
                from pcrcg_tpu.ops.kpconv_tiled import max_pool_tiled

                lidx, tiles = tiled_meta
                mp_tile = self.config_kp.get("tiled_meta_tile", 128)
                b, ns_, c_ = x.shape
                nq_ = neighb_inds.shape[1]
                if nq_ % 128 == 0 and ns_ % mp_tile == 0 and lidx.shape[1] == nq_:
                    # One stacked dispatch for all B clouds (see the same
                    # trick in KPConv's tiled branch): global neighbor
                    # indices get the cloud's row base; shadow (>= Ns)
                    # maps past the stacked array so pad_gather fills 0.
                    n_per = ns_ // mp_tile
                    ioff = (jnp.arange(b, dtype=neighb_inds.dtype) * ns_)[:, None, None]
                    inds_st = jnp.where(
                        neighb_inds >= ns_, b * ns_, neighb_inds + ioff
                    ).reshape(b * nq_, -1)
                    toff = (jnp.arange(b, dtype=tiles.dtype) * n_per)[:, None, None]
                    shortcut = max_pool_tiled(
                        x.reshape(b * ns_, c_), inds_st,
                        lidx.reshape(b * nq_, -1),
                        (tiles + toff).reshape(-1, tiles.shape[2]),
                        tile=mp_tile,
                    ).reshape(b, nq_, c_)
                else:
                    shortcut = jnp.stack([
                        max_pool_tiled(x[bi], neighb_inds[bi], lidx[bi],
                                       tiles[bi], tile=mp_tile)
                        for bi in range(b)
                    ])
            else:
                shortcut = max_pool(x, neighb_inds)
        elif self.strided:
            # The strided shortcut's max-pooled features ride the KPConv's
            # neighbor gather (one gather instead of three on the fused
            # path: coords + conv features + shortcut features).
            y, shortcut = conv(q_pts, s_pts, neighb_inds, y, neighbors_rel,
                               shortcut_x=x)
        else:
            y = conv(q_pts, s_pts, neighb_inds, y, neighbors_rel,
                     tiled_meta=tiled_meta)
            shortcut = x
        y = NormBlock(quarter, name="norm_conv")(y, q_mask)
        y = nn.leaky_relu(y, 0.1)
        y = UnaryBlock(self.out_dim, no_relu=True, name="unary2", dtype=self.dtype)(y, q_mask)

        if self.in_dim != self.out_dim:
            shortcut = UnaryBlock(
                self.out_dim, no_relu=True, name="unary_shortcut", dtype=self.dtype
            )(shortcut, q_mask)
        return nn.leaky_relu(y + shortcut, 0.1)
