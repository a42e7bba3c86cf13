"""Depth map utilities: conversions, flip-fusion post-processing, viz, IO.

Rebuild of `/root/reference/dro_sfm/utils/depth.py` (minus the metric
functions, which live in `dro_sfm_tpu.training.metrics`).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from dro_sfm_tpu.models.depth_pose_net import depth2inv, inv2depth  # noqa: F401
from dro_sfm_tpu.ops.image import flip_lr


def fuse_inv_depth(inv_depth: jnp.ndarray, inv_depth_hat: jnp.ndarray,
                   method: str = "mean") -> jnp.ndarray:
    """Fuse an inverse depth map with its unflipped counterpart
    (`utils/depth.py:202-227`)."""
    if method == "mean":
        return 0.5 * (inv_depth + inv_depth_hat)
    if method == "max":
        return jnp.maximum(inv_depth, inv_depth_hat)
    if method == "min":
        return jnp.minimum(inv_depth, inv_depth_hat)
    raise ValueError(f"Unknown post-process method {method}")


def post_process_inv_depth(inv_depth: jnp.ndarray,
                           inv_depth_flipped: jnp.ndarray,
                           method: str = "mean") -> jnp.ndarray:
    """Flip-TTA fusion with edge ramp masks (`utils/depth.py:230-256`).

    inv_depth / inv_depth_flipped: [..., H, W, 1]; the flipped prediction is
    unflipped, blended, and the left/right 5% borders take the single-view
    estimates to avoid stereo-occlusion artifacts.
    """
    w = inv_depth.shape[-2]
    inv_depth_hat = flip_lr(inv_depth_flipped)
    fused = fuse_inv_depth(inv_depth, inv_depth_hat, method=method)
    xs = jnp.linspace(0.0, 1.0, w, dtype=inv_depth.dtype)[None, :, None]
    mask = 1.0 - jnp.clip(20.0 * (xs - 0.05), 0.0, 1.0)
    mask_hat = mask[:, ::-1]
    return (mask_hat * inv_depth + mask * inv_depth_hat
            + (1.0 - mask - mask_hat) * fused)


def viz_inv_depth(inv_depth: np.ndarray, normalizer: Optional[float] = None,
                  percentile: float = 95, colormap: str = "plasma",
                  filter_zeros: bool = False) -> np.ndarray:
    """Colormap an inverse depth map [H,W] or [H,W,1] -> RGB [H,W,3]
    (`utils/depth.py:65-99`)."""
    from matplotlib import colormaps
    inv = np.asarray(inv_depth).squeeze()
    if normalizer is None:
        vals = inv[inv > 0] if filter_zeros and (inv > 0).any() else inv
        normalizer = np.percentile(vals, percentile)
    inv = inv / (normalizer + 1e-6)
    return colormaps.get_cmap(colormap)(np.clip(inv, 0.0, 1.0))[..., :3]


def load_depth(path: str) -> np.ndarray:
    """Load a depth map from .npz or uint16 .png (`utils/depth.py:11-31`)."""
    if path.endswith("npz"):
        return np.load(path)["depth"]
    if path.endswith("png"):
        import cv2
        depth_png = cv2.imread(path, cv2.IMREAD_ANYDEPTH).astype(np.float64)
        assert depth_png.max() > 255, "Wrong .png depth file"
        return (depth_png / 256.0).astype(np.float32)
    raise NotImplementedError(f"Depth extension not supported: {path}")


def write_depth(path: str, depth: np.ndarray,
                intrinsics: Optional[np.ndarray] = None) -> None:
    """Save a depth map to .npz or uint16 .png (`utils/depth.py:34-62`)."""
    depth = np.asarray(depth).squeeze()
    if path.endswith(".npz"):
        np.savez_compressed(path, depth=depth, intrinsics=intrinsics)
    elif path.endswith(".png"):
        import cv2
        cv2.imwrite(path, (depth * 256.0).astype(np.uint16))
    else:
        raise NotImplementedError(f"Depth filename not valid: {path}")
