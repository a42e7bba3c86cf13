"""Pallas TPU kernel: one fused separable-ConvGRU pass.

The refinement chain of the DRO optimizer is latency-bound: a SepConvGRU
cell lowers to ~15 small XLA ops per pass (two 1-D convs, gate
elementwise chains, concats) whose sequential dispatches and layout
copies dominate the step (docs/perf_notes_r3.md — the in-situ conv MFU is
~17% vs 42% for the same shapes chained back-to-back, plus ms-scale
layout `copy`s flipping the GRU tensors between channel-minor and
width-minor around the (1,5)/(5,1) conv lowering, tools/perf_trace.py).

This kernel evaluates an ENTIRE GRU pass — gate conv, sigmoid, candidate
conv on the gated state, tanh, convex state update —

    zr    = sigmoid(conv1d([h, x], Wzr) + bzr)      # z|r fused, z first
    q     = tanh(conv1d([r*h, x], Wq) + bq)
    h_out = (1 - z) * h + z * q

in ONE Pallas dispatch per direction. **Batch folding** (round 4): the
grid runs over CHUNKS of batch elements, not single elements — the
non-shifted spatial dim and the chunk fold into the matmul M dimension,
so each tap matmul runs at [chunk*H*W, C1] @ [C1, D] scale on the MXU
(M ~ 15k rows at the flagship point) instead of 8-16 serialized
per-element programs whose small matmuls left the MXU idle (measured:
per-element kernels spent MORE custom-call time than the XLA convs they
replaced — 43 vs 24 ms/step). Chunk size adapts to the VMEM budget.

The 1-D conv runs as 5 tap-shifted MXU matmuls accumulated in fp32 —
channel-minor end to end, so no layout transposes exist to copy. The
vertical (5,1) pass transposes H<->W around the kernel (a tile-preserving
major-dim permute, cheap) so the kernel always shifts along the middle
dim of the folded [R, S, C] view and tap windows never cross elements.
Gate math happens on the fp32 accumulators (a strict accuracy improvement
over the bf16-conv XLA path, inside mixed-precision noise).

The backward is a pair of single-dispatch kernels that RECOMPUTE the pass
from (h, x, weights) in VMEM — flash-attention-style rematerialization:
no gate activations are ever written to HBM, forward or backward. They
emit dh, dx and the weight/bias gradients, the latter accumulated across
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
# backward kernels measure ~17 MB per batch element at the flagship 24x80
# grid and scale with the feature-map area.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

# Conservative per-element working-set model for chunk selection and the
# loud-failure guard: ~32 fp32-equivalent bytes per pixel per input
# channel bounds the live set of the fattest (backward) kernel with slack
# (measured ~17 MB vs modeled ~17.7 MB at the flagship [24,80,288]).
_BYTES_PER_PX_CH = 32


def _pick_chunk(b, hh, ww, c1, what):
    """Largest divisor of ``b`` whose working set fits the VMEM budget.

    Batch elements fold into the matmul M dimension, so bigger chunks =
    bigger MXU ops and fewer sequential grid programs; the ceiling is the
    per-program VMEM working set. Raises a clear error (callers fall back
    to the conv path) when even one element exceeds the budget, instead
    of dying in an opaque Mosaic VMEM-exhaustion error."""
    per_elem = _BYTES_PER_PX_CH * hh * ww * c1
    budget = int(_VMEM_LIMIT.vmem_limit_bytes * 0.9)
    if per_elem > budget:
        raise ValueError(
            f"gru_sep1d_pass ({what}): estimated per-element VMEM working "
            f"set ~{per_elem / 2**20:.0f} MB for map [{hh},{ww},{c1}] "
            f"exceeds the {budget / 2**20:.0f} MB kernel budget; use "
            f"conv_impl='conv' (or shrink the grid) at this operating "
            f"point.")
    chunk = 1
    for c in range(1, b + 1):
        if b % c == 0 and c * per_elem <= budget:
            chunk = c
    return chunk


def _prec(dtype):
    return (jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)


def _padded(v):
    """SAME-zero-pad the middle (shift) dim of ``v`` [R, S, C] so tap k of
    a length-S slice at offset k reads v[:, s + k - K//2] (zeros
    outside)."""
    half = K_TAPS // 2
    return jnp.pad(v, ((0, 0), (half, half), (0, 0)))


def _conv1d(v, w_ref, bias, cdt, tap_order="fwd", transpose_w=False):
    """5-tap shifted-matmul 1-D conv of ``v`` [R, S, Cin] (shift along S)
    against the weight ref [K, Cin, D] (or its channel transpose), fp32
    accumulation. Taps are sliced from ONE padded copy inside the loop so
    only a single shifted view is ever live in VMEM.

    tap_order "bwd" + transpose_w evaluates the transpose (input-gradient)
    conv: dx[p] = sum_k da[p - (k - K//2)] @ W[k]^T, which pairs the tap at
    offset k with weight index (K-1-k)."""
    rr, ss, cin = v.shape
    vp = _padded(v.astype(cdt))
    acc = None
    for k in range(K_TAPS):
        wk = w_ref[K_TAPS - 1 - k if tap_order == "bwd" else k].astype(cdt)
        t = jax.lax.slice_in_dim(vp, k, k + ss, axis=1).reshape(rr * ss, cin)
        # transpose_w contracts W's output axis instead of materializing
        # a transposed copy in VMEM (the MXU takes either orientation).
        dims = (((1,), (1,)) if transpose_w else ((1,), (0,))), ((), ())
        y = jax.lax.dot_general(t, wk, dims,
                                preferred_element_type=jnp.float32,
                                precision=_prec(cdt))
        acc = y if acc is None else acc + y
    if bias is not None:
        acc = acc + bias.astype(jnp.float32)
    return acc                                         # [R*S, D] fp32


def _fold(ref):
    """Read a [chunk, H, W, C] block as the folded [chunk*H, W, C] view
    (tile-preserving major-dim merge; taps shift along W only, so windows
    never cross batch elements)."""
    c, hh, ww, d = ref.shape
    return ref[...].reshape(c * hh, ww, d)


def _recompute(h, x, wzr_ref, bzr, wq_ref, bq, cdt):
    """Shared forward evaluation on VMEM-resident values. Returns the
    intermediates the backward needs; h/x enter as folded [R, S, C]
    values.

    Activations are computed on the fp32 conv accumulators but STORED in
    the compute dtype — the fat fp32 gate tensors would otherwise blow the
    VMEM budget in the backward kernels (and the XLA conv path this
    kernel replaces keeps bf16 gate activations anyway)."""
    rr, ss, d = h.shape
    hx = jnp.concatenate([h, x], axis=-1)
    azr = _conv1d(hx, wzr_ref, bzr, cdt)                # [R*S, 2D] fp32
    zr = jax.nn.sigmoid(azr).astype(cdt)
    z, r = zr[:, :d], zr[:, d:]
    hflat = h.reshape(rr * ss, d).astype(cdt)
    rhx = jnp.concatenate(
        [(r * hflat).reshape(rr, ss, d), x.astype(cdt)], axis=-1)
    aq = _conv1d(rhx, wq_ref, bq, cdt)                  # [R*S, D] fp32
    q = jnp.tanh(aq).astype(cdt)
    h_out = (1.0 - z) * hflat + z * q                   # cdt, as the conv path
    return hx, z, r, rhx, q, hflat, h_out


def _fwd_kernel(h_ref, x_ref, wzr_ref, bzr_ref, wq_ref, bq_ref, out_ref, *,
                cdt):
    h, x = _fold(h_ref), _fold(x_ref)
    *_, h_out = _recompute(h, x, wzr_ref, bzr_ref[0], wq_ref, bq_ref[0], cdt)
    out_ref[...] = h_out.reshape(out_ref.shape).astype(out_ref.dtype)


def _grad_intermediates(h, x, wzr_ref, bzr, wq_ref, bq, g, cdt):
    """Recompute the pass and backprop through the gate chain up to (but
    not including) the zr transpose conv — the shared prefix of the two
    backward kernels (split so each stays under the VMEM budget)."""
    rr, ss, d = h.shape
    hx, z, r, rhx, q, hf, _ = _recompute(h, x, wzr_ref, bzr, wq_ref, bq, cdt)
    gf = g.reshape(rr * ss, d).astype(jnp.float32)
    qf, zf = q.astype(jnp.float32), z.astype(jnp.float32)
    dz = gf * (qf - hf.astype(jnp.float32))
    daq_f = (gf * zf) * (1.0 - qf * qf)                 # [R*S, D]
    dbq = jnp.sum(daq_f, axis=0, keepdims=True)
    daq = daq_f.astype(cdt)
    dh0 = gf * (1.0 - zf)
    # Transpose conv: gradient wrt the q-conv input [r*h, x].
    drhx = _conv1d(daq.reshape(rr, ss, d), wq_ref, None,
                   cdt, tap_order="bwd", transpose_w=True)  # [R*S, C1]
    drh = drhx[:, :d]
    dxq = drhx[:, d:]
    rf = r.astype(jnp.float32)
    dr = drh * hf.astype(jnp.float32)
    dazr_f = jnp.concatenate(
        [dz * zf * (1.0 - zf), dr * rf * (1.0 - rf)], axis=-1)
    dbzr = jnp.sum(dazr_f, axis=0, keepdims=True)
    dazr = dazr_f.astype(cdt)                           # [R*S, 2D]
    return hx, rhx, r, dh0, drh, dxq, daq, dazr, dbzr, dbq


def _bwd_input_kernel(h_ref, x_ref, wzr_ref, bzr_ref, wq_ref, bq_ref,
                      g_ref, dh_ref, dx_ref, *, cdt):
    h, x = _fold(h_ref), _fold(x_ref)
    rr, ss, d = h.shape
    _, _, r, dh0, drh, dxq, _, dazr, _, _ = _grad_intermediates(
        h, x, wzr_ref, bzr_ref[0], wq_ref, bq_ref[0], _fold(g_ref), cdt)
    dhx = _conv1d(dazr.reshape(rr, ss, 2 * d), wzr_ref, None,
                  cdt, tap_order="bwd", transpose_w=True)
    dh = dh0 + drh * r + dhx[:, :d]
    dxf = dxq + dhx[:, d:]
    dh_ref[...] = dh.reshape(dh_ref.shape).astype(dh_ref.dtype)
    dx_ref[...] = dxf.reshape(dx_ref.shape).astype(dx_ref.dtype)


def _bwd_weight_kernel(h_ref, x_ref, wzr_ref, bzr_ref, wq_ref, bq_ref,
                       g_ref, dwzr_ref, dbzr_ref, dwq_ref, dbq_ref, *,
                       cdt):
    h, x = _fold(h_ref), _fold(x_ref)
    rr, ss, _ = h.shape
    hx, rhx, _, _, _, _, daq, dazr, dbzr, dbq = _grad_intermediates(
        h, x, wzr_ref, bzr_ref[0], wq_ref, bq_ref[0], _fold(g_ref), cdt)

    # Accumulated across the (sequential) chunk grid.
    @pl.when(pl.program_id(0) == 0)
    def _():
        dwzr_ref[...] = jnp.zeros_like(dwzr_ref)
        dwq_ref[...] = jnp.zeros_like(dwq_ref)
        dbzr_ref[...] = jnp.zeros_like(dbzr_ref)
        dbq_ref[...] = jnp.zeros_like(dbq_ref)

    # Two sequential tap loops so only ONE padded input copy is live at a
    # time (hx_p and rhx_p together were the peak of the fused loop).
    c1 = hx.shape[-1]
    hx_p = _padded(hx.astype(cdt))
    for k in range(K_TAPS):
        hx_k = jax.lax.slice_in_dim(hx_p, k, k + ss,
                                    axis=1).reshape(rr * ss, c1)
        dwzr_ref[k] += jax.lax.dot_general(
            hx_k, dazr,
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_prec(cdt))
    rhx_p = _padded(rhx.astype(cdt))
    for k in range(K_TAPS):
        rhx_k = jax.lax.slice_in_dim(rhx_p, k, k + ss,
                                     axis=1).reshape(rr * ss, c1)
        dwq_ref[k] += jax.lax.dot_general(
            rhx_k, daq,
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_prec(cdt))
    dbzr_ref[...] += dbzr
    dbq_ref[...] += dbq


def _compute_dtype(dtype):
    return jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32


def _common_specs(chunk, hh, ww, d, cx, c1):
    """(h, x, wzr, bzr, wq, bq) block specs shared by fwd and bwd."""
    return [
        pl.BlockSpec((chunk, hh, ww, d), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((chunk, hh, ww, cx), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((K_TAPS, c1, 2 * d), lambda i: (0, 0, 0)),
        pl.BlockSpec((1, 2 * d), lambda i: (0, 0)),
        pl.BlockSpec((K_TAPS, c1, d), lambda i: (0, 0, 0)),
        pl.BlockSpec((1, d), lambda i: (0, 0)),
    ]


def _run_fwd(h, x, wzr, bzr, wq, bq, interpret):
    b, hh, ww, d = h.shape
    cx, c1 = x.shape[-1], d + x.shape[-1]
    cdt = _compute_dtype(h.dtype)
    chunk = _pick_chunk(b, hh, ww, c1, "fwd")
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cdt=cdt),
        out_shape=jax.ShapeDtypeStruct(h.shape, h.dtype),
        grid=(b // chunk,),
        in_specs=_common_specs(chunk, hh, ww, d, cx, c1),
        out_specs=pl.BlockSpec((chunk, hh, ww, d), lambda i: (i, 0, 0, 0)),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(h, x, wzr.astype(cdt), bzr.reshape(1, -1), wq.astype(cdt),
      bq.reshape(1, -1))


def _run_bwd(h, x, wzr, bzr, wq, bq, g, interpret):
    """Two dispatches — input grads and (grid-accumulated) weight grads —
    each recomputing the pass on-chip. One fused kernel exceeds the VMEM
    budget at the flagship shapes (26.3 MB/element measured); the split's
    extra forward recompute is MXU-cheap."""
    b, hh, ww, d = h.shape
    cx, c1 = x.shape[-1], d + x.shape[-1]
    cdt = _compute_dtype(h.dtype)
    chunk = _pick_chunk(b, hh, ww, c1, "bwd")
    common = _common_specs(chunk, hh, ww, d, cx, c1)
    g_spec = pl.BlockSpec((chunk, hh, ww, d), lambda i: (i, 0, 0, 0))
    args = (h, x, wzr.astype(cdt), bzr.reshape(1, -1), wq.astype(cdt),
            bq.reshape(1, -1), g)

    dh, dx = pl.pallas_call(
        functools.partial(_bwd_input_kernel, cdt=cdt),
        out_shape=(jax.ShapeDtypeStruct(h.shape, h.dtype),
                   jax.ShapeDtypeStruct(x.shape, x.dtype)),
        grid=(b // chunk,),
        in_specs=common + [g_spec],
        out_specs=(
            pl.BlockSpec((chunk, hh, ww, d), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((chunk, hh, ww, cx), lambda i: (i, 0, 0, 0))),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(*args)

    dwzr, dbzr, dwq, dbq = pl.pallas_call(
        functools.partial(_bwd_weight_kernel, cdt=cdt),
        out_shape=(jax.ShapeDtypeStruct((K_TAPS, c1, 2 * d), jnp.float32),
                   jax.ShapeDtypeStruct((1, 2 * d), jnp.float32),
                   jax.ShapeDtypeStruct((K_TAPS, c1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32)),
        grid=(b // chunk,),
        in_specs=common + [g_spec],
        out_specs=(pl.BlockSpec((K_TAPS, c1, 2 * d), lambda i: (0, 0, 0)),
                   pl.BlockSpec((1, 2 * d), lambda i: (0, 0)),
                   pl.BlockSpec((K_TAPS, c1, d), lambda i: (0, 0, 0)),
                   pl.BlockSpec((1, d), lambda i: (0, 0))),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(*args)
    return dh, dx, dwzr, dbzr, dwq, dbq


def _to_shift_minor(v, axis):
    """Arrange [B,H,W,C] so the SHIFT dim sits at index 2 of the kernel's
    [B, R', S, C] view: identity for the horizontal pass (axis=2, shift
    W), an H<->W transpose for the vertical pass (axis=1, shift H) — a
    tile-preserving major-dim permute ((W, C) stays the minor pair)."""
    return v if axis == 2 else jnp.transpose(v, (0, 2, 1, 3))


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
    out = _run_fwd(_to_shift_minor(h, axis), _to_shift_minor(x, axis),
                   wzr, bzr, wq, bq, interpret)
    return _to_shift_minor(out, axis)


def _pass_fwd(h, x, wzr, bzr, wq, bq, axis, interpret):
    out = gru_sep1d_pass(h, x, wzr, bzr, wq, bq, axis, interpret)
    return out, (h, x, wzr, bzr, wq, bq)


def _pass_bwd(axis, interpret, res, g):
    h, x, wzr, bzr, wq, bq = res
    dh, dx, dwzr, dbzr, dwq, dbq = _run_bwd(
        _to_shift_minor(h, axis), _to_shift_minor(x, axis), wzr, bzr, wq,
        bq, _to_shift_minor(g, axis), interpret)
    return (_to_shift_minor(dh, axis), _to_shift_minor(dx, axis),
            dwzr.astype(wzr.dtype), dbzr[0].astype(bzr.dtype),
            dwq.astype(wq.dtype), dbq[0].astype(bq.dtype))


gru_sep1d_pass.defvjp(_pass_fwd, _pass_bwd)
