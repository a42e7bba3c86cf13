"""Separable-conv-as-matmul: tap-stacked im2col formulation for TPU.

The refinement GRU's (1,5)/(5,1) separable convs dominate the train step
(~47% of device time; docs/perf_notes_r3.md). XLA's TPU conv lowering
picks a width-minor layout for the (1,5) conv and a channel-minor layout
for everything else, forcing a physical transpose of the activations
around every GRU call (~14 ms/step of synchronous `copy` ops in the
device trace). Expressing the 1-D conv as

    y[b,h,w,:] = concat_k x[b,h,w+k-2,:] @ W[k]  ==  im2col(x) @ W'

keeps the data channel-minor end to end and turns the op into one big
MXU matmul ([B*H*W, K*C] x [K*C, D]) with no layout flips. FLOPs are
identical to the conv; the im2col gather is 5 shifted slices the
compiler fuses.

`Conv1dMatmul` is a drop-in replacement for ``nn.Conv`` restricted to
single-axis kernels (1,k)/(k,1) with SAME zero padding: parameter tree
(`kernel` [kh,kw,C,D], `bias` [D]) and numerics match, so converted
reference checkpoints load unchanged (`tools/convert_torch_weights.py`).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

_conv_init = nn.initializers.he_normal()


def _dot_prec(dtype):
    return (jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)


def unfold_1d(x: jnp.ndarray, k: int, axis: int) -> jnp.ndarray:
    """im2col along one spatial axis: [..., L, ..., C] -> [..., L, ..., k*C]
    with SAME zero padding (taps ordered leading-to-trailing, matching
    ``kernel.reshape(k*C, D)`` tap-major weight layout)."""
    pad = [(0, 0)] * x.ndim
    half = k // 2
    pad[axis] = (half, k - 1 - half)
    xp = jnp.pad(x, pad)
    taps = [jax.lax.slice_in_dim(xp, i, i + x.shape[axis], axis=axis)
            for i in range(k)]
    return jnp.concatenate(taps, axis=-1)


class Conv1dMatmul(nn.Module):
    """``nn.Conv(features, (1,k) | (k,1), SAME zero padding)`` evaluated as
    a tap-stacked matmul. Identical parameter tree and math."""
    features: int
    kernel_size: tuple
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        assert kh == 1 or kw == 1, "single-axis kernels only"
        k, axis = (kh, -3) if kw == 1 else (kw, -2)
        cin = x.shape[-1]
        kernel = self.param("kernel", _conv_init,
                            (kh, kw, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        dt = self.dtype
        cols = unfold_1d(x.astype(dt), k, axis)          # [..., k*C]
        w = kernel.astype(dt).reshape(k * cin, self.features)
        y = jax.lax.dot_general(
            cols, w, (((cols.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_prec(dt))
        return (y + bias.astype(jnp.float32)).astype(dt)
