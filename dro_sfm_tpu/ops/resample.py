"""Bilinear image resampling (the TPU equivalent of `F.grid_sample`).

The reference warps feature maps and RGB with
``F.grid_sample(mode='bilinear', padding_mode='zeros', align_corners=True)``
(`/root/reference/dro_sfm/networks/depth_pose/DepthPoseNet.py:92`,
`/root/reference/dro_sfm/geometry/camera_utils.py:55-56`). This module
implements the same sampling semantics with XLA gathers over channel-last
tensors; the Pallas fused warp+cost kernel in `dro_sfm_tpu.ops.pallas`
overrides the hot path.

Conventions (matching align_corners=True):
* pixel coordinates sample at integer centers 0..W-1;
* normalized coords map via px = (u + 1) / 2 * (W - 1);
* out-of-bounds corner taps contribute zero (zeros padding).
"""
from __future__ import annotations

import jax.numpy as jnp


def unnormalize_coords(coords: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[-1, 1] coords [..., 2] -> pixel coords, align_corners=True style."""
    u = (coords[..., 0] + 1.0) * 0.5 * (w - 1)
    v = (coords[..., 1] + 1.0) * 0.5 * (h - 1)
    return jnp.stack([u, v], axis=-1)


def normalize_coords(coords: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Pixel coords [..., 2] -> [-1, 1], align_corners=True style."""
    u = 2.0 * coords[..., 0] / (w - 1) - 1.0
    v = 2.0 * coords[..., 1] / (h - 1) - 1.0
    return jnp.stack([u, v], axis=-1)


def bilinear_sample(image: jnp.ndarray, coords: jnp.ndarray,
                    normalized: bool = False) -> jnp.ndarray:
    """Sample ``image`` [..., H, W, C] at ``coords`` [..., Ho, Wo, 2].

    coords holds (x, y) positions in source pixel space (or [-1, 1] if
    ``normalized``). Returns [..., Ho, Wo, C]. Zero padding outside the
    image, bilinear filtering inside — semantics of
    ``grid_sample(..., padding_mode='zeros', align_corners=True)``.
    """
    h, w = image.shape[-3], image.shape[-2]
    if normalized:
        coords = unnormalize_coords(coords, h, w)

    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    out = None
    for dy, dx, weight in (
        (0, 0, (1 - wx) * (1 - wy)),
        (0, 1, wx * (1 - wy)),
        (1, 0, (1 - wx) * wy),
        (1, 1, wx * wy),
    ):
        xi = x0 + dx
        yi = y0 + dy
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        tap = _gather_2d(image, jnp.clip(xi, 0, w - 1), jnp.clip(yi, 0, h - 1))
        # weights follow the image dtype: bf16 feature maps keep the whole
        # tap chain (and its saved-for-backward residuals) in bf16 instead
        # of promoting to the f32 coordinate dtype; f32 images (RGB warps
        # in the photometric loss, eval) keep full precision.
        tap = tap * (weight * valid.astype(weight.dtype)).astype(
            image.dtype)[..., None]
        out = tap if out is None else out + tap
    return out


def _gather_2d(image: jnp.ndarray, xi: jnp.ndarray, yi: jnp.ndarray) -> jnp.ndarray:
    """Gather pixels: image [..., H, W, C], integer xi/yi [..., Ho, Wo]."""
    h, w, c = image.shape[-3], image.shape[-2], image.shape[-1]
    batch = image.shape[:-3]
    ho, wo = xi.shape[-2], xi.shape[-1]
    flat_img = image.reshape(*batch, h * w, c)
    flat_idx = (yi * w + xi).reshape(*batch, ho * wo, 1)
    taps = jnp.take_along_axis(flat_img, flat_idx, axis=-2)
    return taps.reshape(*batch, ho, wo, c)
