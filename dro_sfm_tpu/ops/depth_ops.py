"""Depth <-> inverse-depth conversions (leaf module, no intra-repo deps).

Parity: `/root/reference/dro_sfm/utils/depth.py:102-144` and the monodepth2
`disp_to_depth` (`/root/reference/dro_sfm/networks/layers/resnet/layers.py:10-19`).
"""
from __future__ import annotations

import jax.numpy as jnp


def inv2depth(inv_depth: jnp.ndarray) -> jnp.ndarray:
    """Inverse depth -> depth; non-positive inputs map to 0."""
    depth = 1.0 / jnp.maximum(inv_depth, 1e-6)
    return jnp.where(inv_depth <= 0.0, 0.0, depth)


def depth2inv(depth: jnp.ndarray) -> jnp.ndarray:
    """Depth -> inverse depth; non-positive inputs map to 0."""
    inv = 1.0 / jnp.maximum(depth, 1e-6)
    return jnp.where(depth <= 0.0, 0.0, inv)


def disp_to_depth(disp: jnp.ndarray, min_depth: float, max_depth: float):
    """Map a sigmoid output to (scaled_disp, depth) within depth bounds."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    return scaled_disp, 1.0 / scaled_disp
