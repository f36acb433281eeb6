"""2D backbone: ResNet-50/18 encoder + UNet decoder, Flax / NHWC.

Capability parity with reference models/resnet.py:93-230 (torchvision-style
ResNet) and models/resunet.py:12-215 (Encoder wrapper, ``_UpProjection``
decoder): output is a 128-channel feature map at half the input resolution
(240×320 → 120×160), fed to the 2D→3D lift.

TPU-first notes:
* NHWC layout (TPU conv native), bilinear upsampling expressed as two
  separable interpolation matmuls (rides the MXU) with align_corners=True
  sampling to match torch ``F.interpolate(..., align_corners=True)``;
* BatchNorm runs with stored statistics ('batch_stats' collection).  The
  reference detaches all lifted features so backbone2d receives no
  gradients (architectures.py:300-307) — it is effectively a frozen
  feature extractor, so inference-mode BN is exact parity for training
  dynamics, and pretrained torch weights import directly
  (models/torch_import.py).
"""
from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

def Conv(features, kernel_size, strides=(1, 1), name=None, use_bias=False):
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
        name=name,
    )
Norm = partial(nn.BatchNorm, use_running_average=True, momentum=0.9, epsilon=1e-5)


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
    mh = align_corners_matrix(x.shape[-3], h)  # [h, H]
    mw = align_corners_matrix(x.shape[-2], w)  # [w, W]
    x = jnp.einsum("hH,...HWC->...hWC", mh, x)
    return jnp.einsum("wW,...hWC->...hwC", mw, x)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        y = Conv(self.planes, (3, 3), (self.stride, self.stride), name="conv1")(x)
        y = Norm(name="bn1")(y)
        y = nn.relu(y)
        y = Conv(self.planes, (3, 3), name="conv2")(y)
        y = Norm(name="bn2")(y)
        if self.downsample:
            identity = Conv(self.planes, (1, 1), (self.stride, self.stride), name="downsample_conv")(x)
            identity = Norm(name="downsample_bn")(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        identity = x
        y = Conv(self.planes, (1, 1), name="conv1")(x)
        y = nn.relu(Norm(name="bn1")(y))
        y = Conv(self.planes, (3, 3), (self.stride, self.stride), name="conv2")(y)
        y = nn.relu(Norm(name="bn2")(y))
        y = Conv(self.planes * self.expansion, (1, 1), name="conv3")(y)
        y = Norm(name="bn3")(y)
        if self.downsample:
            identity = Conv(
                self.planes * self.expansion, (1, 1), (self.stride, self.stride),
                name="downsample_conv",
            )(x)
            identity = Norm(name="downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNetEncoder(nn.Module):
    """conv7×7/2 → maxpool/2 → 4 stages; returns the four stage outputs
    (reference models/resunet.py:12-39 Encoder)."""

    layers: Sequence[int] = (3, 4, 6, 3)  # ResNet50
    block: str = "bottleneck"

    @nn.compact
    def __call__(self, x):
        x = Conv(64, (7, 7), (2, 2), name="conv1")(x)
        x = nn.relu(Norm(name="bn1")(x))
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
                x = blk(planes, s, need_ds, name=f"layer{stage+1}_{b}")(x)
                in_planes = planes * expansion
            outs.append(x)
        return outs


class UpProjection(nn.Module):
    """Bilinear resize then dual conv branches (reference resunet.py:42-67)."""

    out_features: int

    @nn.compact
    def __call__(self, x, size):
        x = bilinear_resize(x, size)
        b1 = nn.relu(Norm(name="bn1")(Conv(self.out_features, (5, 5), name="conv1")(x)))
        b1 = Norm(name="bn1_2")(Conv(self.out_features, (3, 3), name="conv1_2")(b1))
        b2 = Norm(name="bn2")(Conv(self.out_features, (5, 5), name="conv2")(x))
        return nn.relu(b1 + b2)


class ResUNet(nn.Module):
    """Res50UNet / Res18UNet (reference resunet.py:69-217): encoder stages +
    four UpProjections with skip additions, 1×1 head.

    Input  [..., H, W, 3] RGB in [0,1] — the reference's transform stack
    resizes + ToTensor WITHOUT ImageNet normalization (indoor.py:67-74,
    Normalize is commented out); output [..., H/2, W/2, output_channel]."""

    output_channel: int = 128
    depth: int = 50

    @nn.compact
    def __call__(self, x):
        if self.depth == 50:
            enc = ResNetEncoder((3, 4, 6, 3), "bottleneck", name="encoder")
            top = 2048
        elif self.depth == 18:
            enc = ResNetEncoder((2, 2, 2, 2), "basic", name="encoder")
            top = 512
        else:
            raise ValueError(f"Unsupported ResNet depth: {self.depth}")
        b1, b2, b3, b4 = enc(x)
        d = UpProjection(top // 2, name="up1")(b4, b3.shape[-3:-1]) + b3
        d = UpProjection(top // 4, name="up2")(d, b2.shape[-3:-1]) + b2
        d = UpProjection(top // 8, name="up3")(d, b1.shape[-3:-1]) + b1
        d = UpProjection(top // 16, name="up4")(d, (b1.shape[-3] * 2, b1.shape[-2] * 2))
        return nn.Conv(self.output_channel, (1, 1), use_bias=True, name="conv0")(d)


# Standard ImageNet stats, exported for checkpoints that expect normalized
# inputs (the reference's default path feeds raw 0..1 RGB).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
