"""SSIM distance (parity with the reference photometric loss).

Reference: `/root/reference/dro_sfm/losses/multiview_photometric_loss_mf.py:15-54`
(3x3 average pooling with reflection padding, C1=1e-4, C2=9e-4).
"""
from __future__ import annotations

import jax.numpy as jnp

from dro_sfm_tpu.ops.image import avg_pool_3x3_reflect


def ssim(x: jnp.ndarray, y: jnp.ndarray,
         c1: float = 1e-4, c2: float = 9e-4) -> jnp.ndarray:
    """Per-pixel SSIM similarity of two images [..., H, W, C] in [0, 1]-ish.

    Identical structure to the reference's `SSIM` (3x3 reflect-padded mean
    filter for local statistics).
    """
    mu_x = avg_pool_3x3_reflect(x)
    mu_y = avg_pool_3x3_reflect(y)
    mu_xy = mu_x * mu_y
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y

    sigma_x = avg_pool_3x3_reflect(x * x) - mu_xx
    sigma_y = avg_pool_3x3_reflect(y * y) - mu_yy
    sigma_xy = avg_pool_3x3_reflect(x * y) - mu_xy

    num = (2.0 * mu_xy + c1) * (2.0 * sigma_xy + c2)
    den = (mu_xx + mu_yy + c1) * (sigma_x + sigma_y + c2)
    return num / den


def ssim_loss(x: jnp.ndarray, y: jnp.ndarray,
              c1: float = 1e-4, c2: float = 9e-4) -> jnp.ndarray:
    """Clamped SSIM distance (1 - ssim)/2 in [0, 1]
    (`multiview_photometric_loss_mf.py:175-192`)."""
    return jnp.clip((1.0 - ssim(x, y, c1, c2)) * 0.5, 0.0, 1.0)
