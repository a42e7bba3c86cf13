"""RAFT-style convex upsampling of coarse depth maps.

TPU-native formulation of the reference's `upsample_depth`
(`/root/reference/dro_sfm/networks/depth_pose/DepthPoseNet.py:63-74`): each
fine pixel is a softmax-convex combination of the 3x3 coarse neighborhood.
Instead of unfold + broadcast multiply, we build the 9 shifted neighbor maps
and contract with an einsum — everything stays dense NHWC and fuses well
under XLA.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def neighborhood_3x3(x: jnp.ndarray) -> jnp.ndarray:
    """Zero-padded 3x3 neighborhoods of [..., H, W, 1] -> [..., H, W, 9].

    Neighbor order is row-major over (dy, dx) in {-1, 0, 1}^2, matching
    torch's `F.unfold(depth, [3, 3], padding=1)`.
    """
    pad = [(0, 0)] * (x.ndim - 3) + [(1, 1), (1, 1), (0, 0)]
    xp = jnp.pad(x, pad)
    h, w = x.shape[-3], x.shape[-2]
    taps = []
    for dy in range(3):
        for dx in range(3):
            taps.append(xp[..., dy:dy + h, dx:dx + w, 0])
    return jnp.stack(taps, axis=-1)


def convex_upsample(depth: jnp.ndarray, mask: jnp.ndarray, ratio: int = 8) -> jnp.ndarray:
    """Upsample depth [..., h, w, 1] by ``ratio`` with mask [..., h, w, 9*r*r].

    The mask is softmaxed over the 9 neighbor taps per fine-pixel offset.
    Layout parity with the reference: mask channels factor as
    (9, ratio, ratio) — neighbor index slowest, then row offset, then column
    offset (`DepthPoseNet.py:66-73`).
    """
    batch = depth.shape[:-3]
    h, w = depth.shape[-3], depth.shape[-2]
    taps = neighborhood_3x3(depth)  # [..., h, w, 9] (depth dtype, fp32)
    m = mask.reshape(*batch, h, w, 9, ratio, ratio)
    # Softmax runs in the mask's own dtype: in bf16 mode the mask stack is
    # the single fattest activation of the train step, and a max-subtracted
    # bf16 exp costs ~2^-8 relative on weights that renormalize to 1. The
    # blend accumulates in the (fp32) depth dtype — depth values are never
    # quantized. Expressed as a broadcast multiply + k-sum rather than an
    # einsum: a 9-element contraction lowers to one loop fusion reading the
    # bf16 mask bytes directly, instead of a dot_general whose operand
    # promotion materializes an fp32 copy of the mask.
    m = jax.nn.softmax(m, axis=-3)
    fine = (m * taps[..., None, None].astype(depth.dtype)).sum(axis=-3)
    # [..., h, w, p, q] -> [..., h, p, w, q] -> [..., H, W, 1]
    fine = jnp.swapaxes(fine, -3, -2)
    return fine.reshape(*batch, h * ratio, w * ratio, 1)
