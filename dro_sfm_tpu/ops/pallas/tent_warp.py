"""Pallas TPU kernel: fused bilinear warp via on-chip tent-weight matmuls.

The hot op of the DRO refinement loop (SURVEY.md §3.4) is bilinear sampling
of reference feature maps at projected coordinates. The XLA gather lowers to
slow scatter-adds in the backward pass; the dense-matmul formulation
(`dro_sfm_tpu.ops.matmul_warp`) fixes that but materializes the [P, P]
interpolation matrix in HBM (~15 MB per view per step of pure traffic).

This kernel exploits the separable structure of bilinear weights

    W[p, (qy, qx)] = ty[p, qy] * tx[p, qx],    t*(d) = max(0, 1 - |d|)

to never materialize W at all: for each feature row qy, one MXU matmul
contracts the column tents with that row's features, scaled by the row tent
and accumulated on-chip:

    warped[p, :] = sum_qy ty[p, qy] * (tx[p, :] @ F[qy, :, :])

Semantics match `grid_sample(zeros padding, align_corners=True)` exactly
(the tent support handles border/outside coordinates). A `jax.custom_vjp`
supplies the backward pass with the same structure — the feature gradient is
the transposed contraction (matmuls, no scatters) and coordinate gradients
reuse the forward kernel with tent-derivative weights.

Public entries: `tent_warp(features [B,h,w,C], coords [B,P,2])` (P padded to
a multiple of 128 by the caller) and `pallas_warp_cost` for the DRO cost
shapes (handles padding).

Measured on v5e (b8, 24x80x128, HIGHEST precision): numerically exact vs
the gather path (<=6e-5), fwd 1.3ms vs gather 0.9ms — XLA's gather/scatter
on this generation is strong, so ``warp_impl='gather'`` stays the default;
the kernel is the substrate for fusing more of the refinement step
(cost + encoder convs) in later rounds.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILE = 128


def _tents(c, size, mode):
    """Tent weights [TILE, size] for coords c [TILE, 1] against the integer
    grid. mode 0: tent; 1: d/dc tent."""
    grid = jax.lax.broadcasted_iota(jnp.int32, (1, size), 1).astype(jnp.float32)
    d = c - grid
    if mode == 0:
        return jnp.maximum(0.0, 1.0 - jnp.abs(d))
    return jnp.where((jnp.abs(d) < 1.0) & (d != 0.0), -jnp.sign(d), 0.0)


def _col(mat, idx, size):
    """mat[:, idx] as [TILE, 1] without value dynamic_slice (Mosaic-safe):
    a masked reduction against an iota."""
    sel = (jax.lax.broadcasted_iota(jnp.int32, (1, size), 1) == idx)
    return jnp.sum(mat * sel.astype(mat.dtype), axis=1, keepdims=True)


def _fwd_kernel(coords_ref, feat_ref, out_ref, *, h, w, mode_x, mode_y):
    c = coords_ref[0]                                  # [TILE, 2]
    tx = _tents(c[:, 0:1], w, mode_x)                  # [TILE, w]
    ty = _tents(c[:, 1:2], h, mode_y)                  # [TILE, h]

    def body(qy, acc):
        row = feat_ref[0, qy]                          # [w, C] (ref dyn idx)
        contrib = jnp.dot(tx, row, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        return acc + _col(ty, qy, h) * contrib

    acc = jax.lax.fori_loop(
        0, h, body, jnp.zeros((TILE, feat_ref.shape[-1]), jnp.float32))
    out_ref[0] = acc


def _bwd_feat_kernel(coords_ref, g_ref, out_ref, *, h, w, n_tiles):
    """d_features[qy, qx, c] = sum_p ty[p,qy] tx[p,qx] g[p,c].

    Grid dimension 1 iterates over coordinate tiles; the output block is
    revisited (same index map) and accumulated across tiles.
    """
    t = pl.program_id(1)
    c = coords_ref[0]                                  # [TILE, 2] (this tile)
    g = g_ref[0]                                       # [TILE, C]
    tx = _tents(c[:, 0:1], w, 0)                       # [TILE, w]
    ty = _tents(c[:, 1:2], h, 0)                       # [TILE, h]

    @pl.when(t == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    def row_body(qy, _):
        wgt = tx * _col(ty, qy, h)                     # [TILE, w]
        upd = jnp.dot(wgt.T, g, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        out_ref[0, qy] = out_ref[0, qy] + upd
        return 0

    jax.lax.fori_loop(0, h, row_body, 0)


def _run_fwd(features, coords, mode_x, mode_y, interpret):
    b, h, w, ch = features.shape
    p = coords.shape[1]
    assert p % TILE == 0, f"P={p} must be a multiple of {TILE}"
    grid = (b, p // TILE)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, h=h, w=w, mode_x=mode_x, mode_y=mode_y),
        out_shape=jax.ShapeDtypeStruct((b, p, ch), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE, 2), lambda i, t: (i, t, 0)),
            pl.BlockSpec((1, h, w, ch), lambda i, t: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TILE, ch), lambda i, t: (i, t, 0)),
        interpret=interpret,
    )(coords, features)


def _run_bwd_feat(coords, g, h, w, interpret):
    b, p, ch = g.shape
    n_tiles = p // TILE
    return pl.pallas_call(
        functools.partial(_bwd_feat_kernel, h=h, w=w, n_tiles=n_tiles),
        out_shape=jax.ShapeDtypeStruct((b, h, w, ch), jnp.float32),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE, 2), lambda i, t: (i, t, 0)),
            pl.BlockSpec((1, TILE, ch), lambda i, t: (i, t, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w, ch), lambda i, t: (i, 0, 0, 0)),
        interpret=interpret,
    )(coords, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def tent_warp(features: jnp.ndarray, coords: jnp.ndarray,
              interpret: bool = False) -> jnp.ndarray:
    """Bilinear-sample ``features`` [B,h,w,C] at pixel ``coords`` [B,P,2]
    (P a multiple of 128) -> [B,P,C]. grid_sample zeros/align_corners
    semantics; fully differentiable in both arguments."""
    return _run_fwd(features, coords, 0, 0, interpret)


def _tent_warp_fwd(features, coords, interpret):
    out = _run_fwd(features, coords, 0, 0, interpret)
    return out, (features, coords)


def _tent_warp_bwd(interpret, res, g):
    features, coords = res
    b, h, w, ch = features.shape
    g = g.astype(jnp.float32)
    d_feat = _run_bwd_feat(coords, g, h, w, interpret)
    # Coordinate gradients: <g, W' @ f> per output pixel.
    wdx = _run_fwd(features, coords, 1, 0, interpret)
    wdy = _run_fwd(features, coords, 0, 1, interpret)
    du = jnp.sum(g * wdx, axis=-1)
    dv = jnp.sum(g * wdy, axis=-1)
    return d_feat, jnp.stack([du, dv], axis=-1)


tent_warp.defvjp(_tent_warp_fwd, _tent_warp_bwd)


def pallas_warp_cost(fmap1: jnp.ndarray, fmaps_ref: jnp.ndarray,
                     coords: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """Fused multi-view warp + squared-difference cost via the Pallas warp.

    fmap1 [B,h,w,C]; fmaps_ref [B,N,h,w,C]; coords [B,N,h,w,2] (pixel
    coords) -> cost [B,N,h,w,C]. Pads h*w up to a TILE multiple internally.
    """
    b, n, h, w, ch = fmaps_ref.shape
    p = h * w
    p_pad = -(-p // TILE) * TILE
    flat_coords = coords.reshape(b * n, p, 2)
    if p_pad != p:
        flat_coords = jnp.pad(flat_coords,
                              ((0, 0), (0, p_pad - p), (0, 0)),
                              constant_values=-10.0)  # outside -> zeros
    warped = tent_warp(fmaps_ref.reshape(b * n, h, w, ch),
                       flat_coords, interpret)
    warped = warped[:, :p].reshape(b, n, h, w, ch)
    diff = fmap1[:, None].astype(jnp.float32) - warped
    return diff * diff
