"""Pallas TPU kernel: one fused separable-ConvGRU pass.

The refinement chain of the DRO optimizer is latency-bound: a SepConvGRU
cell lowers to ~15 small XLA ops per pass (two 1-D convs, gate
elementwise chains, concats) whose sequential dispatches and layout
copies dominate the step (docs/perf_notes_r3.md — the in-situ conv MFU is
~17% vs 42% for the same shapes chained back-to-back, plus ~14 ms/step of
synchronous layout `copy`s around the width-minor (1,5) conv lowering).

This kernel evaluates an ENTIRE GRU pass — gate conv, sigmoid, candidate
conv on the gated state, tanh, convex state update —

    zr    = sigmoid(conv1d([h, x], Wzr) + bzr)      # z|r fused, z first
    q     = tanh(conv1d([r*h, x], Wq) + bq)
    h_out = (1 - z) * h + z * q

in ONE Pallas dispatch per direction, with the whole [H, W, C] map of a
batch element resident in VMEM. The 1-D conv runs as 5 tap-shifted MXU
matmuls ([H*W, C1] @ [C1, D]) accumulated in fp32 — channel-minor end to
end, so no layout transposes exist to copy. Gate math happens on the fp32
accumulators (a strict accuracy improvement over the bf16-conv XLA path,
inside mixed-precision noise).

The backward is a second single-dispatch kernel that RECOMPUTES the pass
from (h, x, weights) in VMEM — flash-attention-style rematerialization:
no gate activations are ever written to HBM, forward or backward. It
emits dh, dx and the weight/bias gradients, the latter accumulated across
the sequential TPU grid (one revisited output block, initialized at
program 0 — the same pattern as `tent_warp._bwd_feat_kernel`).

Semantics match `SepConvGRU` (`dro_sfm_tpu/models/update.py`, parity with
`/root/reference/dro_sfm/networks/optim/update.py:47-74`) for one of its
two directional passes; `models/update.py` composes the horizontal and
vertical passes. Parameter trees are unchanged — the caller passes the
same `convzr*`/`convq*` kernels this module's flax siblings declare.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_TAPS = 5

# The whole-map-in-VMEM design needs more scratch than the compiler's
# default 16 MB scoped budget (the v5e has 128 MB of physical VMEM): the
# backward kernels measure ~17 MB at the flagship 24x80 grid and scale
# with the feature-map area (the 320x960 operating point is 2.5x that).
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _prec(dtype):
    return (jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)


def _padded(v, axis):
    """SAME-zero-pad ``v`` along ``axis`` so tap k of a length-L slice at
    offset k reads v[p + k - K//2] (zeros outside)."""
    half = K_TAPS // 2
    pad = [(0, 0)] * v.ndim
    pad[axis] = (half, half)
    return jnp.pad(v, pad)


def _conv1d(v, w_ref, bias, axis, cdt, tap_order="fwd", transpose_w=False):
    """5-tap shifted-matmul 1-D conv of ``v`` [H, W, Cin] against the
    weight ref [K, Cin, D] (or its channel transpose), fp32 accumulation.
    Taps are sliced from ONE padded copy inside the loop so only a single
    shifted view is ever live in VMEM.

    tap_order "bwd" + transpose_w evaluates the transpose (input-gradient)
    conv: dx[p] = sum_k da[p - (k - K//2)] @ W[k]^T, which pairs the tap at
    offset k with weight index (K-1-k)."""
    hh, ww, cin = v.shape
    vp = _padded(v.astype(cdt), axis)
    acc = None
    for k in range(K_TAPS):
        wk = w_ref[K_TAPS - 1 - k if tap_order == "bwd" else k].astype(cdt)
        t = jax.lax.slice_in_dim(vp, k, k + v.shape[axis],
                                 axis=axis).reshape(hh * ww, cin)
        # transpose_w contracts W's output axis instead of materializing
        # a transposed copy in VMEM (the MXU takes either orientation).
        dims = (((1,), (1,)) if transpose_w else ((1,), (0,))), ((), ())
        y = jax.lax.dot_general(t, wk, dims,
                                preferred_element_type=jnp.float32,
                                precision=_prec(cdt))
        acc = y if acc is None else acc + y
    if bias is not None:
        acc = acc + bias.astype(jnp.float32)
    return acc                                         # [H*W, D] fp32


def _recompute(h, x, wzr_ref, bzr, wq_ref, bq, axis, cdt):
    """Shared forward evaluation on VMEM-resident values. Returns the
    intermediates the backward needs; h/x enter as [H, W, C] values.

    Activations are computed on the fp32 conv accumulators but STORED in
    the compute dtype — the fat fp32 gate tensors would otherwise blow the
    16 MB VMEM stack in the backward kernels (and the XLA conv path this
    kernel replaces keeps bf16 gate activations anyway)."""
    hh, ww, d = h.shape
    hx = jnp.concatenate([h, x], axis=-1)
    azr = _conv1d(hx, wzr_ref, bzr, axis, cdt)          # [H*W, 2D] fp32
    zr = jax.nn.sigmoid(azr).astype(cdt)
    z, r = zr[:, :d], zr[:, d:]
    hflat = h.reshape(hh * ww, d).astype(cdt)
    rhx = jnp.concatenate(
        [(r * hflat).reshape(hh, ww, d), x.astype(cdt)], axis=-1)
    aq = _conv1d(rhx, wq_ref, bq, axis, cdt)            # [H*W, D] fp32
    q = jnp.tanh(aq).astype(cdt)
    h_out = (1.0 - z) * hflat + z * q                   # cdt, as the conv path
    return hx, z, r, rhx, q, hflat, h_out


def _fwd_kernel(h_ref, x_ref, wzr_ref, bzr_ref, wq_ref, bq_ref, out_ref, *,
                axis, cdt):
    h, x = h_ref[0], x_ref[0]
    hh, ww, d = h.shape
    *_, h_out = _recompute(h, x, wzr_ref, bzr_ref[0], wq_ref, bq_ref[0],
                           axis, cdt)
    out_ref[0] = h_out.reshape(hh, ww, d).astype(out_ref.dtype)


def _grad_intermediates(h, x, wzr_ref, bzr, wq_ref, bq, g, axis, cdt):
    """Recompute the pass and backprop through the gate chain up to (but
    not including) the zr transpose conv — the shared prefix of the two
    backward kernels (split so each stays under the VMEM stack limit)."""
    hh, ww, d = h.shape
    hx, z, r, rhx, q, hf, _ = _recompute(h, x, wzr_ref, bzr, wq_ref, bq,
                                         axis, cdt)
    gf = g.reshape(hh * ww, d).astype(jnp.float32)
    qf, zf = q.astype(jnp.float32), z.astype(jnp.float32)
    dz = gf * (qf - hf.astype(jnp.float32))
    daq_f = (gf * zf) * (1.0 - qf * qf)                 # [H*W, D]
    dbq = jnp.sum(daq_f, axis=0, keepdims=True)
    daq = daq_f.astype(cdt)
    dh0 = gf * (1.0 - zf)
    # Transpose conv: gradient wrt the q-conv input [r*h, x].
    drhx = _conv1d(daq.reshape(hh, ww, d), wq_ref, None, axis,
                   cdt, tap_order="bwd", transpose_w=True)  # [H*W, C1]
    drh = drhx[:, :d]
    dxq = drhx[:, d:]
    rf = r.astype(jnp.float32)
    dr = drh * hf.astype(jnp.float32)
    dazr_f = jnp.concatenate(
        [dz * zf * (1.0 - zf), dr * rf * (1.0 - rf)], axis=-1)
    dbzr = jnp.sum(dazr_f, axis=0, keepdims=True)
    dazr = dazr_f.astype(cdt)                           # [H*W, 2D]
    return hx, rhx, r, dh0, drh, dxq, daq, dazr, dbzr, dbq


def _bwd_input_kernel(h_ref, x_ref, wzr_ref, bzr_ref, wq_ref, bq_ref,
                      g_ref, dh_ref, dx_ref, *, axis, cdt):
    h, x = h_ref[0], x_ref[0]
    hh, ww, d = h.shape
    cx = x.shape[-1]
    _, _, r, dh0, drh, dxq, _, dazr, _, _ = _grad_intermediates(
        h, x, wzr_ref, bzr_ref[0], wq_ref, bq_ref[0], g_ref[0], axis, cdt)
    dhx = _conv1d(dazr.reshape(hh, ww, 2 * d), wzr_ref, None,
                  axis, cdt, tap_order="bwd", transpose_w=True)
    dh = dh0 + drh * r + dhx[:, :d]
    dxf = dxq + dhx[:, d:]
    dh_ref[0] = dh.reshape(hh, ww, d).astype(dh_ref.dtype)
    dx_ref[0] = dxf.reshape(hh, ww, cx).astype(dx_ref.dtype)


def _bwd_weight_kernel(h_ref, x_ref, wzr_ref, bzr_ref, wq_ref, bq_ref,
                       g_ref, dwzr_ref, dbzr_ref, dwq_ref, dbq_ref, *,
                       axis, cdt):
    h, x = h_ref[0], x_ref[0]
    hh, ww, _ = h.shape
    hx, rhx, _, _, _, _, daq, dazr, dbzr, dbq = _grad_intermediates(
        h, x, wzr_ref, bzr_ref[0], wq_ref, bq_ref[0], g_ref[0], axis, cdt)

    # Accumulated across the (sequential) batch grid.
    @pl.when(pl.program_id(0) == 0)
    def _():
        dwzr_ref[...] = jnp.zeros_like(dwzr_ref)
        dwq_ref[...] = jnp.zeros_like(dwq_ref)
        dbzr_ref[...] = jnp.zeros_like(dbzr_ref)
        dbq_ref[...] = jnp.zeros_like(dbq_ref)

    # Two sequential tap loops so only ONE padded input copy is live at a
    # time (hx_p and rhx_p together were the peak of the fused loop).
    c1 = hx.shape[-1]
    hx_p = _padded(hx.astype(cdt), axis)
    for k in range(K_TAPS):
        hx_k = jax.lax.slice_in_dim(hx_p, k, k + hx.shape[axis],
                                    axis=axis).reshape(hh * ww, c1)
        dwzr_ref[k] += jax.lax.dot_general(
            hx_k, dazr,
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_prec(cdt))
    rhx_p = _padded(rhx.astype(cdt), axis)
    for k in range(K_TAPS):
        rhx_k = jax.lax.slice_in_dim(rhx_p, k, k + hx.shape[axis],
                                     axis=axis).reshape(hh * ww, c1)
        dwq_ref[k] += jax.lax.dot_general(
            rhx_k, daq,
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_prec(cdt))
    dbzr_ref[...] += dbzr
    dbq_ref[...] += dbq


def _compute_dtype(dtype):
    return jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32


def _common_specs(b, hh, ww, d, cx, c1):
    """(h, x, wzr, bzr, wq, bq) block specs shared by fwd and bwd."""
    return [
        pl.BlockSpec((1, hh, ww, d), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((1, hh, ww, cx), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((K_TAPS, c1, 2 * d), lambda i: (0, 0, 0)),
        pl.BlockSpec((1, 2 * d), lambda i: (0, 0)),
        pl.BlockSpec((K_TAPS, c1, d), lambda i: (0, 0, 0)),
        pl.BlockSpec((1, d), lambda i: (0, 0)),
    ]


def _run_fwd(h, x, wzr, bzr, wq, bq, axis, interpret):
    b, hh, ww, d = h.shape
    cx, c1 = x.shape[-1], d + x.shape[-1]
    cdt = _compute_dtype(h.dtype)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, axis=axis - 1, cdt=cdt),
        out_shape=jax.ShapeDtypeStruct(h.shape, h.dtype),
        grid=(b,),
        in_specs=_common_specs(b, hh, ww, d, cx, c1),
        out_specs=pl.BlockSpec((1, hh, ww, d), lambda i: (i, 0, 0, 0)),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(h, x, wzr.astype(cdt), bzr.reshape(1, -1), wq.astype(cdt),
      bq.reshape(1, -1))


def _run_bwd(h, x, wzr, bzr, wq, bq, g, axis, interpret):
    """Two dispatches — input grads and (grid-accumulated) weight grads —
    each recomputing the pass on-chip. One fused kernel exceeds the 16 MB
    VMEM stack at the flagship shapes (26.3 MB measured); the split's
    extra forward recompute is MXU-cheap."""
    b, hh, ww, d = h.shape
    cx, c1 = x.shape[-1], d + x.shape[-1]
    cdt = _compute_dtype(h.dtype)
    common = _common_specs(b, hh, ww, d, cx, c1)
    g_spec = pl.BlockSpec((1, hh, ww, d), lambda i: (i, 0, 0, 0))
    args = (h, x, wzr.astype(cdt), bzr.reshape(1, -1), wq.astype(cdt),
            bq.reshape(1, -1), g)

    dh, dx = pl.pallas_call(
        functools.partial(_bwd_input_kernel, axis=axis - 1, cdt=cdt),
        out_shape=(jax.ShapeDtypeStruct(h.shape, h.dtype),
                   jax.ShapeDtypeStruct(x.shape, x.dtype)),
        grid=(b,),
        in_specs=common + [g_spec],
        out_specs=(pl.BlockSpec((1, hh, ww, d), lambda i: (i, 0, 0, 0)),
                   pl.BlockSpec((1, hh, ww, cx), lambda i: (i, 0, 0, 0))),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(*args)

    dwzr, dbzr, dwq, dbq = pl.pallas_call(
        functools.partial(_bwd_weight_kernel, axis=axis - 1, cdt=cdt),
        out_shape=(jax.ShapeDtypeStruct((K_TAPS, c1, 2 * d), jnp.float32),
                   jax.ShapeDtypeStruct((1, 2 * d), jnp.float32),
                   jax.ShapeDtypeStruct((K_TAPS, c1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32)),
        grid=(b,),
        in_specs=common + [g_spec],
        out_specs=(pl.BlockSpec((K_TAPS, c1, 2 * d), lambda i: (0, 0, 0)),
                   pl.BlockSpec((1, 2 * d), lambda i: (0, 0)),
                   pl.BlockSpec((K_TAPS, c1, d), lambda i: (0, 0, 0)),
                   pl.BlockSpec((1, d), lambda i: (0, 0))),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(*args)
    return dh, dx, dwzr, dbzr, dwq, dbq


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def gru_sep1d_pass(h: jnp.ndarray, x: jnp.ndarray, wzr: jnp.ndarray,
                   bzr: jnp.ndarray, wq: jnp.ndarray, bq: jnp.ndarray,
                   axis: int, interpret: bool = False) -> jnp.ndarray:
    """One directional SepConvGRU pass, fully fused on-chip.

    h [B,H,W,D] hidden state; x [B,H,W,Cx] input features;
    wzr [K,D+Cx,2D] fused z|r gate conv taps (z first — the layout
    `models/update.py` and the weight converter use); bzr [2D];
    wq [K,D+Cx,D] candidate conv taps; bq [D]; ``axis`` 1 for the vertical
    (k,1) pass, 2 for the horizontal (1,k) pass. Returns the updated
    hidden state in ``h.dtype``. Differentiable in every array argument;
    the backward recomputes on-chip (no stored gate activations).
    """
    return _run_fwd(h, x, wzr, bzr, wq, bq, axis, interpret)


def _pass_fwd(h, x, wzr, bzr, wq, bq, axis, interpret):
    out = _run_fwd(h, x, wzr, bzr, wq, bq, axis, interpret)
    return out, (h, x, wzr, bzr, wq, bq)


def _pass_bwd(axis, interpret, res, g):
    h, x, wzr, bzr, wq, bq = res
    dh, dx, dwzr, dbzr, dwq, dbq = _run_bwd(
        h, x, wzr, bzr, wq, bq, g, axis, interpret)
    return (dh, dx, dwzr.astype(wzr.dtype), dbzr[0].astype(bzr.dtype),
            dwq.astype(wq.dtype), dbq[0].astype(bq.dtype))


gru_sep1d_pass.defvjp(_pass_fwd, _pass_bwd)
