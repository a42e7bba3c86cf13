"""Recurrent update blocks: separable ConvGRUs, heads, motion encoders.

TPU-native rebuild of `/root/reference/dro_sfm/networks/optim/update.py`
(NHWC, flax). The inner refinement loops live in
`dro_sfm_tpu.models.depth_pose_net`; these modules are the per-step cells.
"""
from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from dro_sfm_tpu.ops.im2col import Conv1dMatmul

_conv_init = nn.initializers.he_normal()


class _ConvParams(nn.Module):
    """Declare an ``nn.Conv``-identical parameter pair (kernel + bias)
    without the conv op — the Pallas GRU pass consumes the raw weights.
    Same tree as ``nn.Conv(features, kernel_size)``, so checkpoints and
    converted reference weights load on every ``conv_impl`` path."""
    kernel_size: tuple
    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", _conv_init,
                            (kh, kw, self.in_features, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


def _conv(features, kernel, name, padding=None, dtype=jnp.float32):
    if padding is None:
        padding = tuple((k // 2, k // 2) for k in kernel)
    return nn.Conv(features, kernel, padding=padding, kernel_init=_conv_init,
                   dtype=dtype, name=name)


class DepthHead(nn.Module):
    """Two 3x3 convs -> 1-channel map through an activation
    (`update.py:5-15`). The final conv runs in fp32 — depth deltas are
    geometry-critical."""
    hidden_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 act_fn: Callable = jnp.tanh) -> jnp.ndarray:
        y = nn.relu(_conv(self.hidden_dim, (3, 3), "conv1",
                          dtype=self.dtype)(x))
        return act_fn(_conv(1, (3, 3), "conv2")(y.astype(jnp.float32)))


class PoseHead(nn.Module):
    """Two 3x3 convs -> global mean -> 6-DoF vector with the rotation part
    scaled by 0.01 (`update.py:17-28`; the scale applies to the *last* three
    channels, which `pose_vec_to_mat` reads as rotation). The final conv and
    mean run in fp32 — pose deltas are geometry-critical."""
    hidden_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.relu(_conv(self.hidden_dim, (3, 3), "conv1",
                          dtype=self.dtype)(x))
        y = _conv(6, (3, 3), "conv2")(y.astype(jnp.float32))
        y = y.mean(axis=(-3, -2))  # [B, 6]
        return jnp.concatenate([y[..., :3], 0.01 * y[..., 3:]], axis=-1)


class UpMaskNet(nn.Module):
    """Convex-upsampling mask head, output scaled by 0.25
    (`update.py:128-139`)."""
    hidden_dim: int = 128
    ratio: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> jnp.ndarray:
        y = nn.relu(_conv(self.hidden_dim * 2, (3, 3), "conv1",
                          dtype=self.dtype)(feat))
        # The mask stays in the compute dtype end to end: it is the fattest
        # activation of the whole step ([P,B,h,w,9r^2] — ~460 MB fp32 at the
        # flagship point) and only parameterizes a softmax-convex average,
        # so bf16 costs ~2^-8 relative on weights that sum to 1. The depth
        # taps it blends stay fp32 (ops/upsample.py).
        return 0.25 * _conv(self.ratio * self.ratio * 9, (1, 1),
                            "conv2", dtype=self.dtype)(y)


class SepConvGRU(nn.Module):
    """Separable (1x5 then 5x1) convolutional GRU (`update.py:47-74`).

    Gates, state and arithmetic all run in ``dtype``: in bfloat16 mode the
    recurrent carry itself is bf16, halving the recurrent HBM traffic of
    the refinement scan. The integrated quantities the GRU drives —
    inv-depth and pose deltas — are produced by fp32 head convs, so
    geometry precision is unaffected; the hidden state only has to carry
    feature information across 4 inner steps between truncated-BPTT
    detaches.

    The z and r gates read the same ``[h, x]`` input and are independent,
    so they are evaluated as ONE conv with ``2*hidden_dim`` outputs and
    split (``convzr{1,2}``; the torch reference keeps separate convz/convr
    — `update.py:49-60` — and the weight converter stacks them on the
    output-channel axis). Identical math, but the refinement chain is
    dispatch-bound on tiny 1/8-res grids (measured ~60 us/conv inside a
    fused program), and a 256-wide MXU dispatch runs ~2x the FLOP rate of
    two 128-wide ones.

    ``conv_impl="matmul"`` evaluates the separable convs as tap-stacked
    im2col matmuls (`ops/im2col.py`) — identical parameter tree and math,
    but channel-minor end to end, avoiding the per-call layout transpose
    XLA's width-minor (1,5) conv lowering forces.

    ``conv_impl="split"`` splits every gate conv along its input channels
    into an h-part and an x-part (``conv(hx, W) == conv(h, W[:,:,:D]) +
    conv(x, W[:,:,D:])``, exact by linearity; same parameter tree — the
    slices are views of the one kernel). This removes the [h, x] concat
    whose channel-minor result XLA copies into the width-minor layout the
    (1,5)/(5,1) conv lowering wants — measured ~11 ms/step of
    synchronous pre-conv copies in the pose branch (tools/perf_attr.py).

    ``conv_impl="pallas"`` runs each directional pass as ONE fused Pallas
    kernel (`ops/pallas/gru_pass.py`): both convs, the gate chain and the
    state update execute in a single dispatch with the whole map resident
    in VMEM, and the backward recomputes on-chip. Identical parameter tree
    (`_ConvParams`); gate math on fp32 accumulators (a strict accuracy
    improvement over the bf16-conv path, within mixed-precision noise).
    TPU-only — other backends silently use the "conv" path, like the
    pallas->matmul warp fallback in `models/depth_pose_net.py` — unless
    ``pallas_interpret`` forces the kernel through the Pallas interpreter
    (CI parity tests of the real `_pallas_passes` wiring on CPU)."""
    hidden_dim: int = 128
    dtype: Any = jnp.float32
    conv_impl: str = "conv"
    pallas_interpret: bool = False

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        impl = self.conv_impl
        if (impl == "pallas" and not self.pallas_interpret
                and jax.default_backend() != "tpu"):
            impl = "conv"
        if impl == "pallas":
            return self._pallas_passes(h, x)
        if impl == "split":
            return self._split_passes(h, x)

        def make(features, kernel, name):
            if impl == "matmul":
                return Conv1dMatmul(features=features, kernel_size=kernel,
                                    dtype=self.dtype, name=name)
            return _conv(features, kernel, name, dtype=self.dtype)

        h = h.astype(self.dtype)
        x = x.astype(self.dtype)
        for suffix, kernel in (("1", (1, 5)), ("2", (5, 1))):
            hx = jnp.concatenate([h, x], axis=-1)
            zr = nn.sigmoid(make(2 * self.hidden_dim, kernel,
                                 f"convzr{suffix}")(hx))
            z, r = jnp.split(zr, 2, axis=-1)
            q = jnp.tanh(make(self.hidden_dim, kernel, f"convq{suffix}")(
                jnp.concatenate([r * h, x], axis=-1)))
            h = (1.0 - z) * h + z * q
        return h

    def _split_passes(self, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """Concat-free GRU passes: each gate conv applied as the sum of
        its h-slice and x-slice convs (exact by linearity of convolution;
        parameter tree identical to the conv path — the slices are views
        of the one declared kernel)."""
        d = self.hidden_dim
        cin = d + x.shape[-1]
        dt = self.dtype
        h = h.astype(dt)
        x = x.astype(dt)

        def split_conv(a, b, kernel, ksz, bias):
            dims = jax.lax.conv_dimension_numbers(
                a.shape, kernel[:, :, :d].shape, ("NHWC", "HWIO", "NHWC"))
            pad = tuple((k // 2, k // 2) for k in ksz)
            ya = jax.lax.conv_general_dilated(
                a, kernel[:, :, :d].astype(dt), (1, 1), pad,
                dimension_numbers=dims)
            yb = jax.lax.conv_general_dilated(
                b, kernel[:, :, d:].astype(dt), (1, 1), pad,
                dimension_numbers=dims)
            return ya + yb + bias.astype(dt)

        for suffix, ksz in (("1", (1, 5)), ("2", (5, 1))):
            wzr, bzr = _ConvParams(ksz, cin, 2 * d,
                                   name=f"convzr{suffix}")()
            wq, bq = _ConvParams(ksz, cin, d, name=f"convq{suffix}")()
            zr = nn.sigmoid(split_conv(h, x, wzr, ksz, bzr))
            z, r = jnp.split(zr, 2, axis=-1)
            q = jnp.tanh(split_conv(r * h, x, wq, ksz, bq))
            h = (1.0 - z) * h + z * q
        return h

    def _pallas_passes(self, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        from dro_sfm_tpu.ops.pallas.gru_pass import K_TAPS, gru_sep1d_pass

        h = h.astype(self.dtype)
        x = x.astype(self.dtype)
        d = self.hidden_dim
        cin = d + x.shape[-1]
        for suffix, axis in (("1", 2), ("2", 1)):      # (1,5) then (5,1)
            ksz = (1, K_TAPS) if axis == 2 else (K_TAPS, 1)
            wzr, bzr = _ConvParams(ksz, cin, 2 * d,
                                   name=f"convzr{suffix}")()
            wq, bq = _ConvParams(ksz, cin, d, name=f"convq{suffix}")()
            h = gru_sep1d_pass(h, x, wzr.reshape(K_TAPS, cin, 2 * d), bzr,
                               wq.reshape(K_TAPS, cin, d), bq, axis,
                               self.pallas_interpret)
        return h


class ConvGRU(nn.Module):
    """Plain 3x3 convolutional GRU (`update.py:30-45`)."""
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(_conv(self.hidden_dim, (3, 3), "convz")(hx))
        r = nn.sigmoid(_conv(self.hidden_dim, (3, 3), "convr")(hx))
        q = jnp.tanh(_conv(self.hidden_dim, (3, 3), "convq")(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1.0 - z) * h + z * q


class ProjectionInputDepth(nn.Module):
    """Encode (inv-depth, cost) into GRU input features (`update.py:77-99`).

    Output width is ``out_chs`` with the raw inv-depth appended as the last
    channel.
    """
    hidden_dim: int
    out_chs: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inv_depth: jnp.ndarray, cost: jnp.ndarray) -> jnp.ndarray:
        dt = self.dtype
        c = nn.relu(_conv(self.hidden_dim, (1, 1), "convc1", dtype=dt)(cost))
        c = nn.relu(_conv(self.hidden_dim, (3, 3), "convc2", dtype=dt)(c))
        d = nn.relu(_conv(self.hidden_dim, (7, 7), "convd1",
                          dtype=dt)(inv_depth.astype(dt)))
        d = nn.relu(_conv(64, (3, 3), "convd2", dtype=dt)(d))
        y = nn.relu(_conv(self.out_chs - 1, (3, 3), "convd", dtype=dt)(
            jnp.concatenate([c, d], axis=-1)))
        return jnp.concatenate([y, inv_depth.astype(y.dtype)], axis=-1)


class ProjectionInputPose(nn.Module):
    """Encode (pose vector, cost) into GRU input features
    (`update.py:102-124`). The 6-DoF pose is broadcast over the spatial grid
    and appended as the last six channels."""
    hidden_dim: int
    out_chs: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pose: jnp.ndarray, cost: jnp.ndarray) -> jnp.ndarray:
        dt = self.dtype
        b, h, w = cost.shape[0], cost.shape[-3], cost.shape[-2]
        c = nn.relu(_conv(self.hidden_dim, (1, 1), "convc1", dtype=dt)(cost))
        c = nn.relu(_conv(self.hidden_dim, (3, 3), "convc2", dtype=dt)(c))
        pose_map = jnp.broadcast_to(pose[:, None, None, :], (b, h, w, 6))
        p = nn.relu(_conv(self.hidden_dim, (7, 7), "convp1",
                          dtype=dt)(pose_map.astype(dt)))
        p = nn.relu(_conv(64, (3, 3), "convp2", dtype=dt)(p))
        y = nn.relu(_conv(self.out_chs - 6, (3, 3), "convp", dtype=dt)(
            jnp.concatenate([c, p], axis=-1)))
        return jnp.concatenate([y, pose_map.astype(y.dtype)], axis=-1)


class DepthUpdateCell(nn.Module):
    """One inner depth-refinement step (`update.py:143-173`, loop body).

    Given the hidden state, the current inv-depth, the evaluated cost map and
    the context features, produce the updated hidden state and the depth
    delta. The caller owns the loop and the cost evaluation so the warping
    stays outside the cell; the convex-upsampling mask
    (`UpdateMaskHead`) is likewise computed by the caller on the *kept*
    hidden states only — inside the scan it would run (and backprop) every
    inner step even though only the supervised predictions consume it.
    """
    hidden_dim: int = 128
    context_dim: int = 32
    ratio: int = 8
    dtype: Any = jnp.float32
    conv_impl: str = "conv"

    @nn.compact
    def __call__(self, net, inv_depth, cost, context):
        feats = ProjectionInputDepth(
            hidden_dim=self.hidden_dim, out_chs=self.hidden_dim,
            dtype=self.dtype, name="encoder")(inv_depth, cost)
        inp = jnp.concatenate([context, feats], axis=-1)
        net = SepConvGRU(hidden_dim=self.hidden_dim, dtype=self.dtype,
                         conv_impl=self.conv_impl, name="gru")(net, inp)
        delta = DepthHead(hidden_dim=self.hidden_dim, dtype=self.dtype,
                          name="head")(net)
        return net, delta


class UpdateMaskHead(nn.Module):
    """Convex-upsampling mask from a depth-GRU hidden state — the `mask`
    branch of the reference update block (`update.py:147-151,171`), hoisted
    out of the inner loop so it runs only on predictions that are actually
    upsampled (identical math: the mask depends only on the hidden state)."""
    hidden_dim: int = 128
    ratio: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net: jnp.ndarray) -> jnp.ndarray:
        y = nn.relu(_conv(self.hidden_dim * 2, (3, 3), "mask1",
                          dtype=self.dtype)(net))
        # Compute-dtype mask output — see UpMaskNet for the rationale.
        return 0.25 * _conv(self.ratio * self.ratio * 9, (1, 1),
                            "mask2", dtype=self.dtype)(y)


class PoseUpdateCell(nn.Module):
    """One inner pose-refinement step (`update.py:176-199`, loop body)."""
    hidden_dim: int = 128
    context_dim: int = 32
    dtype: Any = jnp.float32
    conv_impl: str = "conv"

    @nn.compact
    def __call__(self, net, pose, cost, context):
        feats = ProjectionInputPose(
            hidden_dim=self.hidden_dim, out_chs=self.hidden_dim,
            dtype=self.dtype, name="encoder")(pose, cost)
        inp = jnp.concatenate([context, feats], axis=-1)
        net = SepConvGRU(hidden_dim=self.hidden_dim, dtype=self.dtype,
                         conv_impl=self.conv_impl, name="gru")(net, inp)
        delta = PoseHead(hidden_dim=self.hidden_dim, dtype=self.dtype,
                         name="head")(net)
        return net, delta
