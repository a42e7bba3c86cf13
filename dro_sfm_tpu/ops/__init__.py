"""Compute ops: resampling, resize, SSIM, convex upsampling, Pallas kernels."""
from dro_sfm_tpu.ops.image import (
    avg_pool_3x3_reflect,
    flip_intrinsics,
    flip_lr,
    gradient_x,
    gradient_y,
    resize_bilinear,
    resize_nearest,
)
from dro_sfm_tpu.ops.resample import bilinear_sample, normalize_coords, unnormalize_coords
from dro_sfm_tpu.ops.ssim import ssim, ssim_loss
from dro_sfm_tpu.ops.upsample import convex_upsample, neighborhood_3x3

__all__ = [
    "avg_pool_3x3_reflect",
    "bilinear_sample",
    "convex_upsample",
    "flip_intrinsics",
    "flip_lr",
    "gradient_x",
    "gradient_y",
    "neighborhood_3x3",
    "normalize_coords",
    "resize_bilinear",
    "resize_nearest",
    "ssim",
    "ssim_loss",
    "unnormalize_coords",
]
