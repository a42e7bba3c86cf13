"""Bilinear warping as a dense tent-weight matmul (MXU-native).

Arbitrary-coordinate gathers (and their scatter-add transposes in the
backward pass) are the slowest primitives on TPU. At the DRO cost-volume
resolution (stride 8: 24x80 = 1920 pixels) the full interpolation matrix
W [P_out, P_in] fits comfortably on chip, so bilinear sampling becomes

    warped = W @ flat(image),   W[p, q] = tent(x_p - qx) * tent(y_p - qy)

with ``tent(d) = max(0, 1 - |d|)``. W is built densely on the VPU (fully
differentiable in the coordinates — the tent is the exact bilinear weight),
and both the forward contraction and its transpose (the gradient wrt the
image) run on the MXU as matmuls. Out-of-bounds behavior matches
grid_sample zeros padding: any tap outside the image contributes nothing
because no in-bounds column is within the tent support.

Use `bilinear_sample_matmul` for small feature grids (the refinement loop's
warp); the gather path in `dro_sfm_tpu.ops.resample` stays preferable for
full-resolution images where W would be huge.
"""
from __future__ import annotations

import jax.numpy as jnp


def tent_weights(coords: jnp.ndarray, h: int, w: int,
                 dtype=jnp.float32) -> jnp.ndarray:
    """Interpolation matrix [..., P_out, h*w] for coords [..., P_out, 2].

    Separable construction: row tents [..., P, h] x col tents [..., P, w]
    combined via an outer product, flattened to [..., P, h*w].
    """
    x = coords[..., 0]
    y = coords[..., 1]
    cols = jnp.arange(w, dtype=coords.dtype)
    rows = jnp.arange(h, dtype=coords.dtype)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None] - cols))  # [...,P,w]
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(y[..., None] - rows))  # [...,P,h]
    # Outer product over (h, w), flatten
    weights = wy[..., :, None] * wx[..., None, :]               # [...,P,h,w]
    return weights.reshape(*weights.shape[:-2], h * w).astype(dtype)


def bilinear_sample_matmul(image: jnp.ndarray, coords: jnp.ndarray,
                           compute_dtype=jnp.float32) -> jnp.ndarray:
    """Sample ``image`` [..., H, W, C] at pixel ``coords`` [..., P, 2] or
    [..., Ho, Wo, 2] via the dense tent matmul. Semantics identical to
    `dro_sfm_tpu.ops.resample.bilinear_sample` (zeros padding,
    align_corners pixel coords)."""
    h, w, c = image.shape[-3], image.shape[-2], image.shape[-1]
    grid_shape = None
    if coords.shape[-1] == 2 and coords.ndim >= 3 and image.ndim == coords.ndim:
        # [..., Ho, Wo, 2] form
        grid_shape = coords.shape[-3:-1]
        coords = coords.reshape(*coords.shape[:-3], -1, 2)
    weights = tent_weights(coords, h, w, dtype=compute_dtype)   # [...,P,hw]
    flat = image.reshape(*image.shape[:-3], h * w, c).astype(compute_dtype)
    out = jnp.einsum("...pq,...qc->...pc", weights, flat,
                     preferred_element_type=jnp.float32)
    if grid_shape is not None:
        out = out.reshape(*out.shape[:-2], *grid_shape, c)
    return out
