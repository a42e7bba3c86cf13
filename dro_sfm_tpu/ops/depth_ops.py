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


def _clip01_straight_through(x: jnp.ndarray) -> jnp.ndarray:
    """clip(x, 0, 1) forward, identity gradient backward.

    A hard clip's zero out-of-range gradient turns saturated disparity
    pixels into permanent dead zones (measured: the selfsup depth map
    froze bit-exact at the boundary for 6 epochs once epoch-0 dynamics
    pushed it out of range). The straight-through estimator keeps the
    bounded forward AND the loss's restoring gradient, so excursions
    can return.
    """
    import jax
    return x + jax.lax.stop_gradient(jnp.clip(x, 0.0, 1.0) - x)


def disp_to_depth(disp: jnp.ndarray, min_depth: float, max_depth: float):
    """Map a sigmoid output to (scaled_disp, depth) within depth bounds.

    ``disp`` is clamped to [0, 1] first (straight-through gradient). The
    reference applies the affine map unclamped
    (`layers/resnet/layers.py:11-20`) but only ever feeds it sigmoid
    outputs OR raw accumulated refinement deltas
    (`DepthPoseNet.py:162,181`) — for the latter, values outside [0, 1]
    produce non-positive inverse depths, which make the photometric
    warp degenerate and the mean-normalized smoothness term unbounded
    (measured: selfsup epoch-0 loss spikes >100x,
    docs/convergence_selfsup_r5.md). Clamping is exact parity on the
    domain the mapping is defined for and a hard guarantee
    inv_depth in [1/max_depth, 1/min_depth] outside it.
    """
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = (min_disp + (max_disp - min_disp)
                   * _clip01_straight_through(disp))
    return scaled_disp, 1.0 / scaled_disp
