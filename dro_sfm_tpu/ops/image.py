"""Image resize / gradients / pyramid helpers (channel-last, jit-safe).

Covers the interpolation surface of the reference
(`/root/reference/dro_sfm/utils/image.py:134-263`): bilinear resize in both
align-corner conventions, nearest resize (used for ground-truth depth,
`match_scales(..., mode='nearest')`), spatial gradients, and scale matching.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dro_sfm_tpu.ops.resample import bilinear_sample


def resize_bilinear(image: jnp.ndarray, shape, align_corners: bool = True) -> jnp.ndarray:
    """Resize [..., H, W, C] to [..., shape[0], shape[1], C] bilinearly.

    ``align_corners=True`` matches `interpolate_image` as used by metric
    evaluation and match_scales (`utils/image.py:166-195`);
    ``align_corners=False`` matches the encoder's `F.interpolate(...,
    align_corners=False)` (half-pixel centers).
    """
    ho, wo = int(shape[0]), int(shape[1])
    h, w = image.shape[-3], image.shape[-2]
    if (h, w) == (ho, wo):
        return image
    if align_corners:
        xs = jnp.linspace(0.0, w - 1.0, wo, dtype=jnp.float32)
        ys = jnp.linspace(0.0, h - 1.0, ho, dtype=jnp.float32)
    else:
        # Half-pixel centers, clamped into the image (torch's
        # area_pixel_compute_source_index) — torch does not anti-alias.
        xs = jnp.clip((jnp.arange(wo) + 0.5) * (w / wo) - 0.5, 0.0, w - 1.0)
        ys = jnp.clip((jnp.arange(ho) + 0.5) * (h / ho) - 0.5, 0.0, h - 1.0)
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # [Ho,Wo,2]
    grid = jnp.broadcast_to(grid, (*image.shape[:-3], ho, wo, 2))
    return bilinear_sample(image, grid.astype(jnp.float32))


def resize_nearest(image: jnp.ndarray, shape) -> jnp.ndarray:
    """Nearest-neighbor resize with torch's `interpolate(mode='nearest')`
    index rule: src = floor(dst * size_in / size_out)."""
    ho, wo = int(shape[0]), int(shape[1])
    h, w = image.shape[-3], image.shape[-2]
    if (h, w) == (ho, wo):
        return image
    ys = jnp.floor(jnp.arange(ho) * (h / ho)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(wo) * (w / wo)).astype(jnp.int32)
    return image[..., ys, :, :][..., :, xs, :]


def gradient_x(image: jnp.ndarray) -> jnp.ndarray:
    """Horizontal forward difference [..., H, W-1, C] (`utils/image.py:134-147`)."""
    return image[..., :, :-1, :] - image[..., :, 1:, :]


def gradient_y(image: jnp.ndarray) -> jnp.ndarray:
    """Vertical forward difference [..., H-1, W, C] (`utils/image.py:149-162`)."""
    return image[..., :-1, :, :] - image[..., 1:, :, :]


def flip_lr(image: jnp.ndarray) -> jnp.ndarray:
    """Horizontal flip of [..., H, W, C] (`utils/image.py:44-59`)."""
    return image[..., :, ::-1, :]


def flip_intrinsics(K: jnp.ndarray, width: int) -> jnp.ndarray:
    """Intrinsics for a horizontally flipped image (`utils/image.py:61-81`)."""
    K = K.at[..., 0, 0].multiply(-1.0)
    K = K.at[..., 0, 2].set(width - K[..., 0, 2])
    return K


def avg_pool_3x3_reflect(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 mean filter with reflection padding, stride 1 (SSIM building block,
    `losses/multiview_photometric_loss_mf.py:33-37`)."""
    pad = [(0, 0)] * (x.ndim - 3) + [(1, 1), (1, 1), (0, 0)]
    xp = jnp.pad(x, pad, mode="reflect")
    out = jax.lax.reduce_window(
        xp, 0.0, jax.lax.add,
        window_dimensions=(1,) * (x.ndim - 3) + (3, 3, 1),
        window_strides=(1,) * x.ndim,
        padding="VALID")
    return out / 9.0
