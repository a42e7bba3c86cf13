"""Pallas TPU kernel: fused bilinear warp via on-chip tent-weight matmuls.

The hot op of the DRO refinement loop (SURVEY.md §3.4) is bilinear sampling
of reference feature maps at projected coordinates. Device traces show the
XLA gather path spends ~45% of the whole train step in gather/scatter
fusions (the scatter-add transpose in the backward is the worst); the dense
tent-matmul formulation (`dro_sfm_tpu.ops.matmul_warp`) fixes the scatters
but materializes the [P, P] interpolation matrix in HBM (~15 MB per view
per refinement step of pure traffic).

This kernel materializes the interpolation matrix only in VMEM, one
[TILE, P] strip at a time, directly in *flattened* input space:

    W[p, q] = tent(x_p - qx[q]) * tent(y_p - qy[q]),  tent(d)=max(0,1-|d|)

with qx = q mod w, qy = q div w built from an on-chip iota — no gathers, no
scatters, no HBM interpolation matrix; the contraction `W @ F` is one MXU
matmul per strip (K = h*w). The backward has the same structure: the
feature gradient is the transposed contraction accumulated across strips,
and coordinate gradients reuse the forward kernel with tent-derivative
weights.

Semantics match `grid_sample(zeros padding, align_corners=True)` exactly
(outside coordinates fall off every tent's support). bf16 feature maps run
the matmul in bf16 on the MXU with f32 accumulation (weights rounded to
bf16, ~2^-8 relative — inside mixed-precision training noise); f32 inputs
use HIGHEST precision and are exact vs the gather path to <=6e-5.

Public entries: `tent_warp(features [B,h,w,C], coords [B,P,2])` (P padded
to a multiple of 128 by the caller), `tent_warp_diff` (warp fused with the
cost subtraction: the f32 warped tensor never reaches HBM, and its VJP
reduces the coordinate-gradient products on-chip), and `pallas_warp_cost`
for the DRO cost shapes (handles padding). Parity: the sampling semantics
of `/root/reference/dro_sfm/networks/depth_pose/DepthPoseNet.py:76-96`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILE = 128


def _qgrid(p_pad, h, w):
    """Flattened input-pixel coordinates [2, p_pad]: row 0 = qx, row 1 = qy.
    Padding positions (q >= h*w) sit far outside so every tent is zero."""
    i = jax.lax.broadcasted_iota(jnp.int32, (1, p_pad), 1)
    qy, qx = i // w, i % w
    off = jnp.where(i < h * w, 0.0, -1e4).astype(jnp.float32)
    return jnp.concatenate(
        [qx.astype(jnp.float32) + off, qy.astype(jnp.float32) + off], axis=0)


def _strip_weights(c, q, mode_x, mode_y, dtype):
    """Interpolation strip W [TILE, p_pad] for coords c [TILE, 2] against
    flattened grid q [2, p_pad]. mode 0: tent; 1: d/dcoord tent."""
    def t(d, mode):
        if mode == 0:
            return jnp.maximum(0.0, 1.0 - jnp.abs(d))
        # d/dc tent(c - q), defined at the kinks as the RIGHT-sided
        # subgradient so it matches autodiff through the gather path
        # (floor(k) = k -> taps {k, k+1}, d out/dc = F[k+1] - F[k]):
        # -1 on [0, 1), +1 on [-1, 0), 0 elsewhere. The previous
        # zero-at-d==0 / open-interval definition silently dropped the
        # coordinate gradient at exactly-integer projections — the
        # near-identity pose regime every selfsup training run starts
        # in (docs/convergence_selfsup_r5.md: epoch-0 loss explosion).
        return jnp.where((d >= -1.0) & (d < 0.0), 1.0,
                         jnp.where((d >= 0.0) & (d < 1.0), -1.0, 0.0))

    dx = c[:, 0:1] - q[0:1, :]                         # [TILE, p_pad]
    dy = c[:, 1:2] - q[1:2, :]
    return (t(dx, mode_x) * t(dy, mode_y)).astype(dtype)


def _dot_prec(dtype):
    return (jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)


def _flatten_pad(features):
    """[B, h, w, C] -> ([B, p_pad, C] zero-padded flat view, p_pad,
    compute dtype for the tent matmuls)."""
    b, h, w, ch = features.shape
    p_pad = -(-(h * w) // TILE) * TILE
    flat = features.reshape(b, h * w, ch)
    if p_pad != h * w:
        flat = jnp.pad(flat, ((0, 0), (0, p_pad - h * w), (0, 0)))
    compute_dtype = (jnp.bfloat16 if features.dtype == jnp.bfloat16
                     else jnp.float32)
    return flat, p_pad, compute_dtype


def _fwd_kernel(coords_ref, feat_ref, out_ref, *, h, w, mode_x, mode_y,
                compute_dtype):
    q = _qgrid(feat_ref.shape[1], h, w)
    wgt = _strip_weights(coords_ref[0], q, mode_x, mode_y, compute_dtype)
    f = feat_ref[0].astype(compute_dtype)              # [p_pad, C]
    out_ref[0] = jnp.dot(wgt, f, preferred_element_type=jnp.float32,
                         precision=_dot_prec(compute_dtype))


def _bwd_feat_kernel(coords_ref, g_ref, out_ref, *, h, w, compute_dtype,
                     sign=1.0):
    """d_features[q, c] = sign * sum_p W[p, q] g[p, c], accumulated across
    coordinate strips (grid dim 1 revisits the output block)."""
    q = _qgrid(out_ref.shape[1], h, w)
    wgt = _strip_weights(coords_ref[0], q, 0, 0, compute_dtype)
    g = (sign * g_ref[0]).astype(compute_dtype)        # [TILE, C]
    upd = jax.lax.dot_general(
        wgt, g, (((0,), (0,)), ((), ())),              # contract TILE axis
        preferred_element_type=jnp.float32,
        precision=_dot_prec(compute_dtype))            # [p_pad, C]

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    out_ref[0] += upd


def _run_fwd(features, coords, mode_x, mode_y, interpret):
    """features [B, h, w, C] (pre-flattened ok), coords [B, P, 2]."""
    b, h, w, ch = features.shape
    p = coords.shape[1]
    assert p % TILE == 0, f"P={p} must be a multiple of {TILE}"
    flat, p_pad, compute_dtype = _flatten_pad(features)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, h=h, w=w, mode_x=mode_x,
                          mode_y=mode_y, compute_dtype=compute_dtype),
        out_shape=jax.ShapeDtypeStruct((b, p, ch), jnp.float32),
        grid=(b, p // TILE),
        in_specs=[
            pl.BlockSpec((1, TILE, 2), lambda i, t: (i, t, 0)),
            pl.BlockSpec((1, p_pad, ch), lambda i, t: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TILE, ch), lambda i, t: (i, t, 0)),
        interpret=interpret,
    )(coords, flat)


def _fwd_diff_kernel(coords_ref, feat_ref, f1_ref, out_ref, *, h, w,
                     compute_dtype, out_dtype):
    """Fused warp-subtract: out = f1 - W @ F for one coordinate strip.

    The subtraction epilogue keeps the f32 ``warped`` product in VMEM only —
    the cost path's residual (`diff`) leaves the kernel directly in the
    feature dtype, skipping the [B,N,P,C] f32 HBM round-trip the two-op
    formulation pays."""
    q = _qgrid(feat_ref.shape[1], h, w)
    wgt = _strip_weights(coords_ref[0], q, 0, 0, compute_dtype)
    f = feat_ref[0].astype(compute_dtype)              # [p_pad, C]
    warped = jnp.dot(wgt, f, preferred_element_type=jnp.float32,
                     precision=_dot_prec(compute_dtype))
    out_ref[0] = (f1_ref[0].astype(jnp.float32) - warped).astype(out_dtype)


def _bwd_coords_kernel(coords_ref, feat_ref, g_ref, duv_ref, *, h, w,
                       compute_dtype, sign=1.0):
    """Coordinate gradient with the [P, C] tent-derivative products reduced
    on-chip: d_coords[p] = sign * <g[p, :], (W' @ F)[p, :]> for both the x-
    and y-derivative tents. Replaces two full-size f32 product tensors in
    HBM with per-strip epilogue reductions. du/dv leave as one [TILE, 2]
    block — the trailing size-2 axis matches the output array's, the only
    strip-sized block shape Mosaic accepts for this output."""
    q = _qgrid(feat_ref.shape[1], h, w)
    c = coords_ref[0]
    f = feat_ref[0].astype(compute_dtype)              # [p_pad, C]
    g = (sign * g_ref[0]).astype(jnp.float32)          # [TILE, C]
    prec = _dot_prec(compute_dtype)
    px = jnp.dot(_strip_weights(c, q, 1, 0, compute_dtype), f,
                 preferred_element_type=jnp.float32, precision=prec)
    py = jnp.dot(_strip_weights(c, q, 0, 1, compute_dtype), f,
                 preferred_element_type=jnp.float32, precision=prec)
    duv_ref[0] = jnp.stack(
        [jnp.sum(px * g, axis=-1), jnp.sum(py * g, axis=-1)], axis=-1)


def _run_fwd_diff(f1, features, coords, n_views, interpret):
    """f1 [B, P, C] (P-padded, zero fill); features [B*N, h, w, C];
    coords [B*N, P, 2] -> diff [B*N, P, C] in f1's dtype."""
    bn, h, w, ch = features.shape
    p = coords.shape[1]
    assert p % TILE == 0, f"P={p} must be a multiple of {TILE}"
    flat, p_pad, compute_dtype = _flatten_pad(features)
    return pl.pallas_call(
        functools.partial(_fwd_diff_kernel, h=h, w=w,
                          compute_dtype=compute_dtype, out_dtype=f1.dtype),
        out_shape=jax.ShapeDtypeStruct((bn, p, ch), f1.dtype),
        grid=(bn, p // TILE),
        in_specs=[
            pl.BlockSpec((1, TILE, 2), lambda i, t: (i, t, 0)),
            pl.BlockSpec((1, p_pad, ch), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((1, TILE, ch),
                         lambda i, t: (i // n_views, t, 0)),
        ],
        out_specs=pl.BlockSpec((1, TILE, ch), lambda i, t: (i, t, 0)),
        interpret=interpret,
    )(coords, flat, f1)


def _run_bwd_coords(coords, features, g, sign, interpret):
    """d_coords [B*N, P, 2] f32 for the warp-subtract backward."""
    bn, h, w, ch = features.shape
    p = coords.shape[1]
    flat, p_pad, compute_dtype = _flatten_pad(features)
    return pl.pallas_call(
        functools.partial(_bwd_coords_kernel, h=h, w=w,
                          compute_dtype=compute_dtype, sign=sign),
        out_shape=jax.ShapeDtypeStruct((bn, p, 2), jnp.float32),
        grid=(bn, p // TILE),
        in_specs=[
            pl.BlockSpec((1, TILE, 2), lambda i, t: (i, t, 0)),
            pl.BlockSpec((1, p_pad, ch), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((1, TILE, ch), lambda i, t: (i, t, 0)),
        ],
        out_specs=pl.BlockSpec((1, TILE, 2), lambda i, t: (i, t, 0)),
        interpret=interpret,
    )(coords, flat, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def tent_warp_diff(f1: jnp.ndarray, features: jnp.ndarray,
                   coords: jnp.ndarray, n_views: int,
                   interpret: bool = False) -> jnp.ndarray:
    """Fused warp-subtract: ``f1 - bilinear_sample(features, coords)``.

    f1 [B, P, C] (each of the B targets broadcast over its ``n_views``
    reference maps); features [B*n_views, h, w, C]; coords
    [B*n_views, P, 2] -> diff [B*n_views, P, C] in f1's dtype. Sampling
    semantics identical to `tent_warp`; differentiable in all three array
    arguments. The residuals are just (features, coords) — the backward
    recomputes nothing and materializes no full-size f32 tensors."""
    return _run_fwd_diff(f1, features, coords, n_views, interpret)


def _tent_warp_diff_fwd(f1, features, coords, n_views, interpret):
    out = _run_fwd_diff(f1, features, coords, n_views, interpret)
    return out, (features, coords)


def _tent_warp_diff_bwd(n_views, interpret, res, g):
    features, coords = res
    bn, p, ch = g.shape
    # d_f1: diff is linear (+1) in f1, broadcast over views.
    d_f1 = jnp.sum(g.astype(jnp.float32).reshape(bn // n_views, n_views,
                                                 p, ch), axis=1).astype(g.dtype)
    # d_features / d_coords carry the -1 sign of the warped term. g goes to
    # the kernels in its own (possibly bf16) dtype — each strip casts in
    # VMEM, so no full-size f32 copy of the gradient is written to HBM.
    d_feat = _run_bwd_feat(coords, g, features.shape[1],
                           features.shape[2], features.dtype, interpret,
                           sign=-1.0)
    d_coords = _run_bwd_coords(coords, features, g, -1.0, interpret)
    return d_f1, d_feat, d_coords


tent_warp_diff.defvjp(_tent_warp_diff_fwd, _tent_warp_diff_bwd)


def _run_bwd_feat(coords, g, h, w, dtype, interpret, sign=1.0):
    b, p, ch = g.shape
    p_pad = -(-(h * w) // TILE) * TILE
    compute_dtype = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    out = pl.pallas_call(
        functools.partial(_bwd_feat_kernel, h=h, w=w,
                          compute_dtype=compute_dtype, sign=sign),
        out_shape=jax.ShapeDtypeStruct((b, p_pad, ch), jnp.float32),
        grid=(b, p // TILE),
        in_specs=[
            pl.BlockSpec((1, TILE, 2), lambda i, t: (i, t, 0)),
            pl.BlockSpec((1, TILE, ch), lambda i, t: (i, t, 0)),
        ],
        out_specs=pl.BlockSpec((1, p_pad, ch), lambda i, t: (i, 0, 0)),
        interpret=interpret,
    )(coords, g)
    return out[:, :h * w].reshape(b, h, w, ch).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def tent_warp(features: jnp.ndarray, coords: jnp.ndarray,
              interpret: bool = False) -> jnp.ndarray:
    """Bilinear-sample ``features`` [B,h,w,C] at pixel ``coords`` [B,P,2]
    (P a multiple of 128) -> [B,P,C] f32. grid_sample zeros/align_corners
    semantics; fully differentiable in both arguments."""
    return _run_fwd(features, coords, 0, 0, interpret)


def _tent_warp_fwd(features, coords, interpret):
    out = _run_fwd(features, coords, 0, 0, interpret)
    return out, (features, coords)


def _tent_warp_bwd(interpret, res, g):
    features, coords = res
    b, h, w, ch = features.shape
    d_feat = _run_bwd_feat(coords, g, h, w, features.dtype, interpret)
    # Coordinate gradients <g, W' @ f>: the [B, P, C] tent-derivative
    # products are reduced on-chip by the same kernel the fused
    # warp-subtract backward uses — no full-size f32 tensors in HBM.
    d_coords = _run_bwd_coords(coords, features, g, 1.0, interpret)
    return d_feat, d_coords


tent_warp.defvjp(_tent_warp_fwd, _tent_warp_bwd)


def pallas_warp_cost(fmap1: jnp.ndarray, fmaps_ref: jnp.ndarray,
                     coords: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """Fused multi-view warp + squared-difference cost via the Pallas warp.

    fmap1 [B,h,w,C]; fmaps_ref [B,N,h,w,C]; coords [B,N,h,w,2] (pixel
    coords) -> cost [B,N,h,w,C] in fmap1's dtype. Pads h*w up to a TILE
    multiple internally.

    The warp and the subtraction run fused (`tent_warp_diff`): the f32
    warped features never leave VMEM, and the backward's tent-derivative
    products are reduced on-chip — only the squaring (with its bf16 ``diff``
    residual) is left to XLA's elementwise fusion.
    """
    b, n, h, w, ch = fmaps_ref.shape
    p = h * w
    p_pad = -(-p // TILE) * TILE
    flat_coords = coords.reshape(b * n, p, 2)
    f1 = fmap1.reshape(b, p, ch)
    if p_pad != p:
        flat_coords = jnp.pad(flat_coords,
                              ((0, 0), (0, p_pad - p), (0, 0)),
                              constant_values=-10.0)  # outside -> zeros
        f1 = jnp.pad(f1, ((0, 0), (0, p_pad - p), (0, 0)))
    diff = tent_warp_diff(f1, fmaps_ref.reshape(b * n, h, w, ch),
                          flat_coords, n, interpret)
    diff = diff[:, :p].reshape(b, n, h, w, ch)
    return diff * diff
