"""VGG16-slice perceptual feature distance.

Rebuild of `/root/reference/dro_sfm/networks/layers/PercepNet.py:6-77`: the
first three VGG16 conv stages produce feature maps whose weighted L1
distances form an optional perceptual loss (wired via
``network_requirements['percep_net']``, default off in the reference).
ImageNet weights can be imported from a torchvision state dict via
`tools/convert_torch_weights.py`; random init otherwise.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from dro_sfm_tpu.ops.image import resize_bilinear

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)

# VGG16 conv plan per slice: (out_channels per conv, maxpool after slice?)
_SLICES = (
    ((64, 64), False),          # features[0:4]   conv1_1, conv1_2
    ((128, 128), True),         # features[4:9]   pool + conv2_*
    ((256, 256, 256), True),    # features[9:16]  pool + conv3_*
)


class PercepNet(nn.Module):
    """Three-stage VGG16 feature extractor + weighted L1 distance."""
    weights: Sequence[float] = (0.15, 0.25, 0.6)
    resize: bool = True

    def normalize(self, x: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.asarray(_IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(_IMAGENET_STD, x.dtype)
        out = (x - mean) / std
        if self.resize:
            out = resize_bilinear(out, (224, 224), align_corners=False)
        return out

    @nn.compact
    def __call__(self, im1: jnp.ndarray, im2: jnp.ndarray) -> jnp.ndarray:
        """Perceptual distance map [B, h, w, 1] at the first-slice resolution
        (`PercepNet.py:41-64`)."""
        x = jnp.concatenate([im1, im2], axis=0)
        x = self.normalize(x)
        losses = []
        ref_hw = None
        conv_idx = 0
        for si, (channels, pool_before) in enumerate(_SLICES):
            if pool_before:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for ch in channels:
                x = nn.relu(nn.Conv(ch, (3, 3), padding=1,
                                    name=f"conv{conv_idx}")(x))
                conv_idx += 1
            f1, f2 = jnp.split(x, 2, axis=0)
            if ref_hw is None:
                ref_hw = (f1.shape[-3], f1.shape[-2])
            d = self.weights[si] * jnp.abs(f1 - f2).mean(
                axis=-1, keepdims=True)
            losses.append(resize_bilinear(d, ref_hw, align_corners=False))
        return sum(losses)
