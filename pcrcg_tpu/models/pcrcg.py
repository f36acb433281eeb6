"""PCRCG: the full color+geometry registration model.

Composes the 2D backbone lift (models/lift.py) with the KPFCNN
encoder-decoder (models/kpfcnn.py) — the split the reference implements
inside one forward (models/architectures.py:181-610, with backbone2d passed
in from the trainer).  With ``config.image_feature`` off this is exactly
KPFCNN over ones features (in_feats_dim=1); on, point features are the
lifted 128-channel image features + ones column (in_feats_dim=129).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from pcrcg_tpu.config import Config
from pcrcg_tpu.models.kpfcnn import KPFCNN
from pcrcg_tpu.models.lift import ImageLift
from pcrcg_tpu.ops.pyramid import Pyramid


class PCRCG(nn.Module):
    config: Config

    @nn.compact
    def __call__(
        self,
        pyramid: Pyramid,
        features: jnp.ndarray,
        images: Optional[Dict[str, jnp.ndarray]] = None,
    ):
        cfg = self.config
        if cfg.image_feature:
            assert images is not None, "image_feature=True needs image inputs"
            features = ImageLift(
                output_channel=cfg.backbone2d_channels,
                depth=cfg.backbone2d_depth,
                compute_dtype=cfg.image_compute_dtype,
                name="lift",
            )(
                pyramid.points[0],
                pyramid.masks[0],
                images["colors"],
                images["depths"],
                images["world2cam"],
                images["valid_maps"],
                images["intrinsics"],
            )
        return KPFCNN(cfg, name="kpfcnn")(pyramid, features)
