"""Multi-view photometric (self-supervised) loss with iteration decay.

TPU-native rebuild of
`/root/reference/dro_sfm/losses/multiview_photometric_loss_mf.py`: for every
refinement prediction p and context view n, synthesize the target image by
warping the context view with (inv_depth_p, pose_{n,p}), take L1 + SSIM,
reduce over views (min + optional automask), γ-decay over predictions, plus
edge-aware smoothness.

Everything is vectorized over the stacked prediction axis P and view axis N —
no Python loops over views/scales; the γ weights are one tensor contraction.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp

from dro_sfm_tpu.geometry.camera import Camera
from dro_sfm_tpu.geometry.pose import Pose
from dro_sfm_tpu.losses.progressive import progressive_scale_mask
from dro_sfm_tpu.ops.depth_ops import inv2depth
from dro_sfm_tpu.ops.image import gradient_x, gradient_y
from dro_sfm_tpu.ops.resample import bilinear_sample
from dro_sfm_tpu.ops.ssim import ssim_loss


@dataclasses.dataclass(frozen=True)
class PhotometricLossConfig:
    """Mirrors the reference's loss kwargs (`default_config.py:90-105`)."""
    ssim_loss_weight: float = 0.85
    smooth_loss_weight: float = 0.001
    c1: float = 1e-4
    c2: float = 9e-4
    photometric_reduce_op: str = "min"
    clip_loss: float = 0.0
    automask_loss: bool = True
    gamma: float = 0.85  # iteration decay (`multiview_photometric_loss_mf.py:259`)
    # Divide by the summed γ weights. The MF reference sums raw decayed
    # terms (`:259-265`); the single-frame path averages uniformly over
    # scales (packnet-sfm lineage) = gamma 1.0 + normalization.
    normalize_weights: bool = False
    # Optional VGG16 perceptual distance between the target and the final
    # prediction's warped context views (the reference ships PercepNet and
    # the `percep_net` requirement plumbing but never consumes it in a
    # loss; here the term is config-selectable end to end).
    percep_loss_weight: float = 0.0
    # drop the coarsest remaining scale after every this fraction of
    # training (0 = off; `loss_base.py:40-77`)
    progressive_scaling: float = 0.0
    # Orientation of the 1/2^i smoothness decay along the prediction axis.
    # False (MF): predictions are refinement iterations ordered first ->
    # last and the reference's own quirk weights the FIRST iteration
    # fully. True (single-frame): predictions are decoder scales stacked
    # coarsest-first, and the packnet-sfm convention weights the finest
    # (LAST) scale fully.
    smooth_finest_last: bool = False


def warp_context(image_ctx: jnp.ndarray, inv_depths: jnp.ndarray,
                 pose_vecs: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Warp context views into the target frame for every prediction.

    image_ctx [B,N,H,W,3]; inv_depths [P,B,H,W,1]; pose_vecs [B,N,P,6];
    K [B,3,3] -> warped [P,B,N,H,W,3].

    Parity: `warp_ref_image` (`multiview_photometric_loss_mf.py:132-171`) —
    prediction p is warped with the pose of the same refinement iteration.
    """
    p, b = inv_depths.shape[0], inv_depths.shape[1]
    n = image_ctx.shape[1]
    cam = Camera(jnp.broadcast_to(K[None], (p, b, 3, 3)))
    points = cam.reconstruct(inv2depth(inv_depths), frame="w")  # [P,B,H,W,3]
    # Reference cameras: [B,N,P] poses -> reorder to [P,B,N].
    ref_pose = Pose.from_vec(jnp.transpose(pose_vecs, (2, 0, 1, 3)), "euler")
    ref_cam = Camera(jnp.broadcast_to(K[None, :, None], (p, b, n, 3, 3)), ref_pose)
    coords = ref_cam.project(
        jnp.broadcast_to(points[:, :, None], (p, b, n, *points.shape[2:])),
        frame="w", normalize=False)                              # [P,B,N,H,W,2]
    ctx = jnp.broadcast_to(image_ctx[None], (p, *image_ctx.shape))
    return bilinear_sample(ctx, coords)


def _photometric_residual(est: jnp.ndarray, ref: jnp.ndarray,
                          cfg: PhotometricLossConfig) -> jnp.ndarray:
    """Per-pixel L1 + SSIM residual for [P,B,N,H,W,3] inputs.

    Channel-averaged -> [P,B,N,H,W,1] when SSIM is on; with
    ``ssim_loss_weight == 0`` the raw 3-channel L1 is returned (the
    reference keeps it 3-channel and lets the min-reduce span channels).

    Parity: `calc_photometric_loss` (`:194-229`).
    """
    l1 = jnp.abs(est - ref)
    if cfg.ssim_loss_weight > 0.0:
        s = ssim_loss(est, ref, cfg.c1, cfg.c2)
        res = (cfg.ssim_loss_weight * s.mean(axis=-1, keepdims=True)
               + (1.0 - cfg.ssim_loss_weight) * l1.mean(axis=-1, keepdims=True))
    else:
        res = l1
    if cfg.clip_loss > 0.0:
        # Clamp at mean + clip * std. The reference pools the statistics
        # over the WHOLE per-(prediction, view) tensor — batch included
        # (`photometric_loss[i].mean()` on [B,C,H,W], `:223-227`) — so for
        # the [P,B,N,H,W,C] layout only axes 0 (prediction) and 2 (view)
        # are kept.
        axes = (1,) + tuple(range(3, res.ndim))
        mean = res.mean(axis=axes, keepdims=True)
        std = res.std(axis=axes, keepdims=True)
        res = jnp.minimum(res, mean + cfg.clip_loss * std)
    return res


def smoothness_loss(inv_depths: jnp.ndarray, image: jnp.ndarray,
                    cfg: PhotometricLossConfig,
                    mask=None) -> jnp.ndarray:
    """Edge-aware smoothness with mean-normalized inverse depth.

    Parity: `calc_smoothness_loss` (`:273-299`) + `calc_smoothness` /
    `inv_depths_normalize` (`utils/depth.py:147-199`). Prediction p carries
    a 1/2^p factor. ``mask`` [P] (optional) drops predictions excluded by
    progressive scaling — the reference truncates the prediction list
    before the *whole* loss (`loss_base.py:40-77`), so the smoothness term
    must honor the schedule too; masking with a matching denominator keeps
    shapes static.
    """
    p = inv_depths.shape[0]
    mean_inv = inv_depths.mean(axis=(-3, -2, -1), keepdims=True)
    norm = inv_depths / jnp.maximum(mean_inv, 1e-6)
    dx = jnp.abs(gradient_x(norm))
    dy = jnp.abs(gradient_y(norm))
    wx = jnp.exp(-jnp.abs(gradient_x(image)).mean(axis=-1, keepdims=True))
    wy = jnp.exp(-jnp.abs(gradient_y(image)).mean(axis=-1, keepdims=True))
    sx = (dx * wx[None]).mean(axis=tuple(range(1, dx.ndim)))  # [P]
    sy = (dy * wy[None]).mean(axis=tuple(range(1, dy.ndim)))
    idx = jnp.arange(p, dtype=inv_depths.dtype)
    if cfg.smooth_finest_last:
        idx = (p - 1) - idx  # coarsest-first stacks: full weight at [-1]
    scale = 2.0 ** idx
    per_pred = (sx + sy) / scale
    if mask is None:
        return per_pred.sum() / p
    return (per_pred * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def multiview_photometric_loss(
        image: jnp.ndarray, context: jnp.ndarray, inv_depths: jnp.ndarray,
        K: jnp.ndarray, pose_vecs: jnp.ndarray,
        cfg: PhotometricLossConfig = PhotometricLossConfig(),
        percep_fn=None, progress=0.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total self-supervised loss.

    image [B,H,W,3] (original, un-jittered); context [B,N,H,W,3];
    inv_depths [P,B,H,W,1]; K [B,3,3]; pose_vecs [B,N,P,6].

    Parity: `MultiViewPhotometricDecayLoss.forward` (`:303-361`), with the
    min-over-views reduction, automask, γ^(P-1-p) decay weighting and
    smoothness term. ``percep_fn(im1, im2) -> [B*,h,w,1]`` adds the
    optional perceptual term on the final prediction's warps when
    ``cfg.percep_loss_weight > 0``.
    """
    p = inv_depths.shape[0]
    warped = warp_context(context, inv_depths, pose_vecs, K)  # [P,B,N,H,W,3]
    target = image[None, :, None]                             # [1,B,1,H,W,3]
    residuals = _photometric_residual(
        warped, jnp.broadcast_to(target, warped.shape), cfg)  # [P,B,N,H,W,1]

    if cfg.automask_loss:
        # Identity (unwarped) residual per view — prediction-independent,
        # so computed once at P=1 and broadcast (not recomputed P times;
        # its SSIM window reductions are the expensive part).
        one = (1,) + warped.shape[1:]
        ident = _photometric_residual(
            jnp.broadcast_to(context[None], one),
            jnp.broadcast_to(target, one), cfg)
        ident = jnp.broadcast_to(ident, residuals.shape)
        residuals = jnp.concatenate([residuals, ident], axis=2)

    if cfg.photometric_reduce_op == "min":
        # Joint minimum over views AND channels: the reference cats the
        # per-view maps along the channel axis before the min (`:250`), so
        # with SSIM off (3-channel residual) the min spans both; for the
        # channel-averaged [...,1] residual the channel min is a no-op.
        per_pred = residuals.min(axis=2).min(axis=-1).mean(axis=(1, 2, 3))
    elif cfg.photometric_reduce_op == "mean":
        per_pred = residuals.mean(axis=tuple(range(1, residuals.ndim)))
    else:
        raise ValueError(cfg.photometric_reduce_op)

    gamma_w = cfg.gamma ** jnp.arange(p - 1, -1, -1, dtype=inv_depths.dtype)
    prog_mask = progressive_scale_mask(
        p, cfg.progressive_scaling, progress, inv_depths.dtype)
    gamma_w = gamma_w * prog_mask
    photometric = (per_pred * gamma_w).sum()
    if cfg.normalize_weights:
        photometric = photometric / gamma_w.sum()

    metrics = {"photometric_loss": photometric}
    loss = photometric
    if cfg.smooth_loss_weight > 0.0:
        smooth = cfg.smooth_loss_weight * smoothness_loss(
            inv_depths, image, cfg, mask=prog_mask)
        metrics["smoothness_loss"] = smooth
        loss = loss + smooth
    if cfg.percep_loss_weight > 0.0 and percep_fn is not None:
        # Final prediction only (the converged estimate); views folded into
        # batch so the VGG slices run as one MXU pass.
        b, n = context.shape[0], context.shape[1]
        final_warp = warped[-1].reshape(b * n, *warped.shape[3:])
        tgt = jnp.broadcast_to(image[:, None], context.shape)
        tgt = tgt.reshape(b * n, *context.shape[2:])
        percep = cfg.percep_loss_weight * percep_fn(tgt, final_warp).mean()
        metrics["percep_loss"] = percep
        loss = loss + percep
    return loss, metrics
