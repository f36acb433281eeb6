"""2D backbone: ResNet-50/18 encoder + UNet decoder, Flax / NHWC.

Capability parity with reference models/resnet.py:93-230 (torchvision-style
ResNet) and models/resunet.py:12-215 (Encoder wrapper, ``_UpProjection``
decoder): output is a 128-channel feature map at half the input resolution
(240×320 → 120×160), fed to the 2D→3D lift.

TPU-first notes:
* NHWC layout (TPU conv native), bilinear upsampling expressed as two
  separable interpolation matmuls (rides the MXU) with align_corners=True
  sampling to match torch ``F.interpolate(..., align_corners=True)``;
* BatchNorm matches what the reference actually RUNS: backbone2d never
  leaves torch train mode (lib/trainer.py:49-70 builds it and neither
  trainer nor tester ever calls .eval() on it) and is fed ONE image per
  call (architectures.py:278-281), so torch normalizes every image by its
  own per-channel spatial batch statistics — the stored running stats are
  updated but never read.  ``TrainModeBN`` reproduces that (per-image
  (H, W) statistics, biased variance) while keeping mean/var in
  'batch_stats' so pretrained torch weights import unchanged
  (models/torch_import.py).  Set ``bn_running_average=True`` for
  classic inference-mode BN instead.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

def Conv(features, kernel_size, strides=(1, 1), name=None, use_bias=False, dtype=None):
    """Conv with torch-style SYMMETRIC padding (k//2 each side): flax
    'SAME' places padding asymmetrically for strided convs, which shifts
    every downsampling layer relative to torch checkpoints."""
    k = kernel_size[0]
    return nn.Conv(
        features,
        kernel_size,
        strides,
        padding=((k // 2, k // 2), (k // 2, k // 2)),
        use_bias=use_bias,
        kernel_init=nn.initializers.he_normal(),
        dtype=dtype,
        name=name,
    )


class TrainModeBN(nn.Module):
    """BatchNorm as the reference runs it (see module docstring): normalizes
    each image with its own per-channel (H, W) statistics — torch train-mode
    BN at batch size 1 — and never reads the stored running stats.  The
    stored mean/var live in 'batch_stats' purely for torch-checkpoint
    import compatibility (and for ``running=True`` inference mode)."""

    running: bool = False
    epsilon: float = 1e-5
    dtype: object = None  # output dtype; statistics always computed in f32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (c,))
        bias = self.param("bias", nn.initializers.zeros_init(), (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        xf = x.astype(jnp.float32)
        if self.running:
            mean, var = ra_mean.value, ra_var.value
        else:
            # Per-image spatial statistics; biased variance (torch's
            # normalization denominator in train mode).
            mean = jnp.mean(xf, axis=(-3, -2), keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=(-3, -2), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype or x.dtype)


def Norm(name=None, running: bool = False, dtype=None):
    return TrainModeBN(running=running, dtype=dtype, name=name)


def align_corners_matrix(n_in: int, n_out: int) -> jnp.ndarray:
    """[n_out, n_in] linear-interpolation matrix with align_corners=True
    (out[i] samples input at i·(n_in−1)/(n_out−1))."""
    if n_in == 1:
        return jnp.ones((n_out, 1), jnp.float32)
    pos = np.arange(n_out) * (n_in - 1) / max(n_out - 1, 1)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = pos - lo
    m = np.zeros((n_out, n_in), np.float32)
    m[np.arange(n_out), lo] += 1.0 - frac
    m[np.arange(n_out), hi] += frac
    return jnp.asarray(m)


def bilinear_resize(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """x [..., H, W, C] -> [..., h, w, C], align_corners=True."""
    h, w = size
    mh = align_corners_matrix(x.shape[-3], h).astype(x.dtype)  # [h, H]
    mw = align_corners_matrix(x.shape[-2], w).astype(x.dtype)  # [w, W]
    x = jnp.einsum("hH,...HWC->...hWC", mh, x)
    return jnp.einsum("wW,...hWC->...hwC", mw, x)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    bn_running: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        identity = x
        y = Conv(self.planes, (3, 3), (self.stride, self.stride), name="conv1", dtype=self.dtype)(x)
        y = Norm(name="bn1", running=self.bn_running)(y)
        y = nn.relu(y)
        y = Conv(self.planes, (3, 3), name="conv2", dtype=self.dtype)(y)
        y = Norm(name="bn2", running=self.bn_running)(y)
        if self.downsample:
            identity = Conv(self.planes, (1, 1), (self.stride, self.stride), name="downsample_conv", dtype=self.dtype)(x)
            identity = Norm(name="downsample_bn", running=self.bn_running)(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4
    bn_running: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        identity = x
        y = Conv(self.planes, (1, 1), name="conv1", dtype=self.dtype)(x)
        y = nn.relu(Norm(name="bn1", running=self.bn_running)(y))
        y = Conv(self.planes, (3, 3), (self.stride, self.stride), name="conv2", dtype=self.dtype)(y)
        y = nn.relu(Norm(name="bn2", running=self.bn_running)(y))
        y = Conv(self.planes * self.expansion, (1, 1), name="conv3", dtype=self.dtype)(y)
        y = Norm(name="bn3", running=self.bn_running)(y)
        if self.downsample:
            identity = Conv(
                self.planes * self.expansion, (1, 1), (self.stride, self.stride),
                name="downsample_conv", dtype=self.dtype,
            )(x)
            identity = Norm(name="downsample_bn", running=self.bn_running)(identity)
        return nn.relu(y + identity)


class ResNetEncoder(nn.Module):
    """conv7×7/2 → maxpool/2 → 4 stages; returns the four stage outputs
    (reference models/resunet.py:12-39 Encoder)."""

    layers: Sequence[int] = (3, 4, 6, 3)  # ResNet50
    block: str = "bottleneck"
    bn_running: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = Conv(64, (7, 7), (2, 2), name="conv1", dtype=self.dtype)(x)
        x = nn.relu(Norm(name="bn1", running=self.bn_running)(x))
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        blk = Bottleneck if self.block == "bottleneck" else BasicBlock
        expansion = 4 if self.block == "bottleneck" else 1
        outs = []
        in_planes = 64
        for stage, (planes, n_blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                s = stride if b == 0 else 1
                need_ds = b == 0 and (s != 1 or in_planes != planes * expansion)
                x = blk(planes, s, need_ds, bn_running=self.bn_running, dtype=self.dtype, name=f"layer{stage+1}_{b}")(x)
                in_planes = planes * expansion
            outs.append(x)
        return outs


class UpProjection(nn.Module):
    """Bilinear resize then dual conv branches (reference resunet.py:42-67)."""

    out_features: int
    bn_running: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x, size):
        x = bilinear_resize(x, size)
        b1 = nn.relu(Norm(name="bn1", running=self.bn_running)(Conv(self.out_features, (5, 5), name="conv1", dtype=self.dtype)(x)))
        b1 = Norm(name="bn1_2", running=self.bn_running)(Conv(self.out_features, (3, 3), name="conv1_2", dtype=self.dtype)(b1))
        b2 = Norm(name="bn2", running=self.bn_running)(Conv(self.out_features, (5, 5), name="conv2", dtype=self.dtype)(x))
        return nn.relu(b1 + b2)


class ResUNet(nn.Module):
    """Res50UNet / Res18UNet (reference resunet.py:69-217): encoder stages +
    four UpProjections with skip additions, 1×1 head.

    Input  [..., H, W, 3] RGB in [0,1] — the reference's transform stack
    resizes + ToTensor WITHOUT ImageNet normalization (indoor.py:67-74,
    Normalize is commented out); output [..., H/2, W/2, output_channel]."""

    output_channel: int = 128
    depth: int = 50
    bn_running_average: bool = False
    # Compute dtype for the conv stack (params stay f32; BN statistics are
    # always f32).  bfloat16 doubles MXU conv throughput and halves HBM
    # traffic on TPU; output is returned in f32 either way.
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype or x.dtype)
        if self.depth == 50:
            enc = ResNetEncoder((3, 4, 6, 3), "bottleneck", self.bn_running_average, self.dtype, name="encoder")
            top = 2048
        elif self.depth == 18:
            enc = ResNetEncoder((2, 2, 2, 2), "basic", self.bn_running_average, self.dtype, name="encoder")
            top = 512
        else:
            raise ValueError(f"Unsupported ResNet depth: {self.depth}")
        b1, b2, b3, b4 = enc(x)
        d = UpProjection(top // 2, self.bn_running_average, self.dtype, name="up1")(b4, b3.shape[-3:-1]) + b3
        d = UpProjection(top // 4, self.bn_running_average, self.dtype, name="up2")(d, b2.shape[-3:-1]) + b2
        d = UpProjection(top // 8, self.bn_running_average, self.dtype, name="up3")(d, b1.shape[-3:-1]) + b1
        d = UpProjection(top // 16, self.bn_running_average, self.dtype, name="up4")(d, (b1.shape[-3] * 2, b1.shape[-2] * 2))
        d = nn.Conv(self.output_channel, (1, 1), use_bias=True, dtype=self.dtype, name="conv0")(d)
        return d.astype(jnp.float32)


# Standard ImageNet stats, exported for checkpoints that expect normalized
# inputs (the reference's default path feeds raw 0..1 RGB).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
