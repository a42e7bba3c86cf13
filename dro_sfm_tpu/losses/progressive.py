"""Progressive scaling: anneal the number of supervised scales with
training progress.

TPU-native rebuild of `ProgressiveScaling`
(`/root/reference/dro_sfm/losses/loss_base.py:40-77`): after every
``progressive_scaling`` fraction of training, the coarsest remaining scale
is dropped from the loss. The reference truncates the prediction *list*
(`for i in range(self.n)` over a finest-first list); under jit the
prediction count is static, so the same schedule becomes a branch-free 0/1
weight mask over the stacked prediction axis — predictions here are ordered
coarsest-first, so the active set is the *last* ``n`` entries.
"""
from __future__ import annotations

import jax.numpy as jnp


def progressive_scale_mask(num_preds: int, threshold: float, progress,
                           dtype=jnp.float32) -> jnp.ndarray:
    """[P] weight mask with the finest ``n(progress)`` scales active.

    ``threshold`` <= 0 disables (all ones). Schedule parity with
    `loss_base.py:25-28,45-48`: boundaries at threshold*(i+1) capped by 1.0;
    ``n = P - searchsorted(boundaries, progress)``.
    """
    if threshold <= 0.0:
        return jnp.ones(num_preds, dtype)
    bounds = jnp.asarray(
        [threshold * (i + 1) for i in range(num_preds - 1)] + [1.0], dtype)
    n = num_preds - jnp.searchsorted(
        bounds, jnp.asarray(progress, dtype))
    return (jnp.arange(num_preds) >= num_preds - n).astype(dtype)
