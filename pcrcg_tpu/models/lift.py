"""2D→3D feature lift: run the 2D backbone on each color image, gate by
SuperGlue valid maps, gather at projected pixel locations, and assemble the
per-point input features.

Capability parity with reference models/architectures.py:195-514 (the
img_num ∈ {1,2,3} branches), static-shape re-design:
* instead of variable-length (inds2d, inds3d) scatters, every point carries
  per-image (pixel, valid) pairs from ops.projection.project_points;
* the reference applies LATER images' scatters first so image 1 wins
  overlapping points (architectures.py:367-370) — here a priority select
  over the image axis (first valid image wins);
* lifted features are concatenated with a ones column and DETACHED
  (architectures.py:300-307) — backbone2d receives no gradients through
  the lift, exactly like the reference;
* points with no valid image keep the all-ones row (the
  ``x = ones.repeat(1,129)`` initialization, architectures.py:360).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from pcrcg_tpu.models.resunet import ResUNet
from pcrcg_tpu.ops.projection import gather_pixel_features, project_points


class ImageLift(nn.Module):
    """Computes [2, N, 128+1] input features for KPFCNN from per-cloud
    image stacks.

    Inputs (per pair):
      points      [2, N, 3]   padded clouds (raw/augmented frame)
      masks       [2, N]
      colors      [2, I, H, W, 3]    I = img_num color images per cloud
      depths      [2, I, h, w]       depth maps (meters) at half res
      world2cam   [2, I, 4, 4]       fragment frame -> camera
      valid_maps  [2, I, h, w]       SuperGlue confidence gating maps
      intrinsics  [4, 4]             rescaled to (w, h)
    """

    output_channel: int = 128
    depth: int = 50
    thresh: float = 0.1
    # Conv-stack compute dtype for the backbone ("bfloat16" halves HBM
    # traffic and doubles MXU throughput; lift math stays f32 — the
    # backbone returns f32 feature maps either way).
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, points, masks, colors, depths, world2cam, valid_maps, intrinsics):
        # Quantized input support — a serving-path win on tunneled/remote
        # hosts where per-dispatch arg staging is on the critical path:
        # uint8 colors (the source PNGs are 8-bit; /255 here is exact),
        # uint16 depths in millimeters (the source format,
        # reference indoor.py:239 divides by 1000), uint8 valid maps.
        # Cuts the per-pair image payload ~4x vs all-f32.
        # Dequantization must be BIT-identical to the loader's numpy
        # division (x.astype(f32)/255 etc.): XLA lowers division by a
        # constant to multiply-by-reciprocal, which is 1 ulp off for
        # about half of all inputs — and a deep backbone chaotically
        # amplifies a 1-ulp input difference into O(1) feature changes.
        # The two-constant form x*c_hi + x*c_lo (c_hi = f32(1/d),
        # c_lo = f32(1/d - c_hi)) reproduces the correctly-rounded
        # quotient EXHAUSTIVELY for all uint8 (d=255) and uint16 (d=1000)
        # values — verified against numpy on the CPU backend by the
        # suite, and pinnable on the serving backend via
        # PCRCG_TEST_TPU=1 pytest tests/test_exact_div.py (see
        # .claude/skills/verify/SKILL.md: XLA:TPU fp contraction could
        # in principle round differently, so re-run on-chip when
        # touching this path).
        def _exact_div(x, denom):
            import numpy as np

            c_hi = np.float32(1.0 / denom)
            c_lo = np.float32(1.0 / denom - np.float64(c_hi))
            xf = x.astype(jnp.float32)
            return xf * c_hi + xf * c_lo

        if colors.dtype == jnp.uint8:
            colors = _exact_div(colors, 255.0)
        if depths.dtype == jnp.uint16:
            depths = _exact_div(depths, 1000.0)
        if valid_maps.dtype != jnp.float32:
            valid_maps = valid_maps.astype(jnp.float32)
        backbone = ResUNet(
            self.output_channel, self.depth,
            dtype=jnp.dtype(self.compute_dtype), name="backbone2d",
        )
        two, n_img = colors.shape[0], colors.shape[1]
        fmaps = backbone(colors.reshape((-1,) + colors.shape[2:]))
        fmaps = fmaps.reshape(colors.shape[:2] + fmaps.shape[1:])  # [2,I,h,w,C]
        fmaps = fmaps * valid_maps[..., None]  # 2D-match gating (:282-285)

        def lift_cloud(pts, msk, fmap_i, depth_i, w2c_i, vmaps_i):
            def lift_one(fmap, dmap, w2c):
                pix, valid = project_points(pts, dmap, w2c, intrinsics, msk, self.thresh)
                feats = gather_pixel_features(fmap, pix, valid)
                return feats, valid

            feats, valid = jax.vmap(lift_one)(fmap_i, depth_i, w2c_i)  # [I,N,C],[I,N]
            # Priority select: first valid image wins (image 1 overwrites).
            first = jnp.argmax(valid, axis=0)  # [N]; 0 when none valid
            any_valid = jnp.any(valid, axis=0)
            sel = jnp.take_along_axis(feats, first[None, :, None], axis=0)[0]
            lifted = jnp.concatenate([sel, jnp.ones_like(sel[:, :1])], axis=-1)
            ones = jnp.ones_like(lifted)
            out = jnp.where(any_valid[:, None], lifted, ones)
            return jnp.where(msk[:, None], out, 0.0)

        out = jax.vmap(lift_cloud)(points, masks, fmaps, depths, world2cam, valid_maps)
        # Detach: no gradient into backbone2d through the lift (:300-307).
        return jax.lax.stop_gradient(out)
