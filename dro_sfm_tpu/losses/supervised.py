"""Supervised depth + pose losses with γ iteration decay.

TPU-native rebuild of
`/root/reference/dro_sfm/losses/supervised_loss.py:204-371`
(`SupervisedDepthPoseLoss`): masked L1 on inverse depth across all
refinement predictions plus a pose loss expressed as the difference of
reprojected pixel coordinates (GT pose vs. predicted pose, both using GT
depth), γ^(P-1-p)-weighted and weight-normalized.

Also provides the generic single-term losses (`supervised_loss.py:12-99`):
l1 / mse / berhu / silog / abs_rel selected by method suffix.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp

from dro_sfm_tpu.geometry.camera import Camera
from dro_sfm_tpu.geometry.pose import Pose
from dro_sfm_tpu.losses.progressive import progressive_scale_mask
from dro_sfm_tpu.ops.depth_ops import depth2inv, inv2depth


@dataclasses.dataclass(frozen=True)
class SupervisedLossConfig:
    min_depth: float = 0.1
    max_depth: float = 100.0
    gamma: float = 0.85
    # drop the coarsest remaining scale after every this fraction of
    # training (0 = off; `loss_base.py:40-77`)
    progressive_scaling: float = 0.0


def supervised_depth_loss(inv_depths: jnp.ndarray, gt_inv_depth: jnp.ndarray,
                          cfg: SupervisedLossConfig,
                          progress=0.0) -> jnp.ndarray:
    """γ-decayed masked L1 on inverse depth.

    inv_depths [P,B,H,W,1]; gt_inv_depth [B,H,W,1].

    Parity: `calculate_loss` (`supervised_loss.py:244-277`) — the mask keeps
    gt inverse depths strictly inside (1/max_depth, 1/min_depth), and the
    mean runs over *all* pixels with invalid ones zeroed.
    """
    p = inv_depths.shape[0]
    min_disp = 1.0 / cfg.max_depth
    max_disp = 1.0 / cfg.min_depth
    valid = ((gt_inv_depth > min_disp) & (gt_inv_depth < max_disp))
    valid = valid.astype(inv_depths.dtype)[None]               # [1,B,H,W,1]
    per_pred = (valid * jnp.abs(gt_inv_depth[None] - inv_depths)).mean(
        axis=tuple(range(1, inv_depths.ndim)))                 # [P]
    w = cfg.gamma ** jnp.arange(p - 1, -1, -1, dtype=inv_depths.dtype)
    w = w * progressive_scale_mask(p, cfg.progressive_scaling, progress,
                                   inv_depths.dtype)
    return (per_pred * w).sum() / w.sum()


def _reproject_coords(depth: jnp.ndarray, pose_mats: jnp.ndarray,
                      K: jnp.ndarray):
    """Normalized ref-view coords for target pixels lifted with ``depth``.

    depth [B,H,W,1]; pose_mats [..., B, 4, 4] (leading axes broadcast);
    returns (coords [..., B, H, W, 2], valid [..., B, H, W, 2]).

    Parity: `get_ref_coords` (`supervised_loss.py:279-291`).
    """
    cam = Camera(K)
    points = cam.reconstruct(depth, frame="w")                 # [B,H,W,3]
    lead = pose_mats.shape[:-3]
    ref_cam = Camera(jnp.broadcast_to(K, (*lead, *K.shape)), Pose(pose_mats))
    coords = ref_cam.project(
        jnp.broadcast_to(points, (*lead, *points.shape)),
        frame="w", normalize=True)
    valid = (coords >= -1.0) & (coords <= 1.0)
    return coords, valid


def supervised_pose_loss(pose_vecs: jnp.ndarray, gt_pose_context: jnp.ndarray,
                         gt_depth: jnp.ndarray, K: jnp.ndarray,
                         cfg: SupervisedLossConfig,
                         progress=0.0) -> jnp.ndarray:
    """Reprojection-difference pose loss.

    pose_vecs [B,N,P,6]; gt_pose_context [B,N,4,4] (target->context);
    gt_depth [B,H,W,1].

    Parity: `calc_pose_loss` (`supervised_loss.py:293-325`): coords from GT
    pose vs. predicted pose, masked by both in-bounds masks and a GT-depth
    range of (min_depth, max_depth / 4), |Δ| clamped at 1, mean over all
    pixels, averaged over views, γ-weighted over predictions.
    """
    b, n, p = pose_vecs.shape[0], pose_vecs.shape[1], pose_vecs.shape[2]
    depth_mask = ((gt_depth > cfg.min_depth)
                  & (gt_depth < cfg.max_depth / 4.0))          # [B,H,W,1]

    # [P,N,B,4,4] predicted pose matrices.
    pred = Pose.from_vec(jnp.transpose(pose_vecs, (2, 1, 0, 3)), "euler").mat
    gt = jnp.broadcast_to(jnp.transpose(gt_pose_context, (1, 0, 2, 3)),
                          (n, b, 4, 4))

    coords_pred, mask_pred = _reproject_coords(gt_depth, pred, K)   # [P,N,B,H,W,2]
    coords_gt, mask_gt = _reproject_coords(gt_depth, gt, K)         # [N,B,H,W,2]

    valid = (mask_gt[None] & mask_pred).astype(gt_depth.dtype)
    valid = valid * depth_mask[None, None]
    diff = valid * jnp.minimum(jnp.abs(coords_pred - coords_gt[None]), 1.0)
    per = diff.mean(axis=tuple(range(2, diff.ndim)))           # [P,N]
    per_pred = per.mean(axis=1)                                # [P]
    w = cfg.gamma ** jnp.arange(p - 1, -1, -1, dtype=diff.dtype)
    w = w * progressive_scale_mask(p, cfg.progressive_scaling, progress,
                                   diff.dtype)
    return (per_pred * w).sum() / w.sum()


def supervised_depth_pose_loss(
        inv_depths: jnp.ndarray, gt_depth: jnp.ndarray,
        pose_vecs: jnp.ndarray, gt_pose_context: jnp.ndarray,
        K: jnp.ndarray, cfg: SupervisedLossConfig = SupervisedLossConfig(),
        progress=0.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Combined supervised loss (`SupervisedDepthPoseLoss.forward`,
    `supervised_loss.py:328-371`)."""
    gt_inv = depth2inv(gt_depth)
    loss_depth = supervised_depth_loss(inv_depths, gt_inv, cfg, progress)
    loss_pose = supervised_pose_loss(pose_vecs, gt_pose_context, gt_depth, K,
                                     cfg, progress)
    loss = loss_depth + loss_pose
    return loss, {
        "depth_loss": loss_depth,
        "pose_loss": loss_pose,
        "all_loss": loss,
    }


# ---------------------------------------------------------------------------
# Generic per-pixel supervised terms (`supervised_loss.py:12-99`)
# ---------------------------------------------------------------------------

def berhu_loss(pred: jnp.ndarray, gt: jnp.ndarray,
               threshold: float = 0.2) -> jnp.ndarray:
    """BerHu (reverse Huber) loss (`supervised_loss.py:12-56`)."""
    huber_c = threshold * jnp.max(pred - gt)
    diff = jnp.abs(pred - gt)
    sq = jnp.where(diff > huber_c, diff * diff, 0.0)
    n_sq = jnp.sum(diff > huber_c)
    total = diff.sum() + sq.sum()
    return total / (diff.size + n_sq)


def silog_loss(pred: jnp.ndarray, gt: jnp.ndarray, ratio: float = 10.0,
               ratio2: float = 0.85) -> jnp.ndarray:
    """Scale-invariant log loss (`supervised_loss.py:58-71`)."""
    log_diff = jnp.log(pred * ratio) - jnp.log(gt * ratio)
    silog1 = jnp.mean(log_diff ** 2)
    silog2 = ratio2 * jnp.mean(log_diff) ** 2
    return jnp.sqrt(silog1 - silog2) * ratio


def get_loss_fn(method: str):
    """Select a loss by method suffix (`supervised_loss.py:75-99`)."""
    if method.endswith("l1"):
        return lambda x, y: jnp.mean(jnp.abs(x - y))
    if method.endswith("mse"):
        return lambda x, y: jnp.mean((x - y) ** 2)
    if method.endswith("berhu"):
        return berhu_loss
    if method.endswith("silog"):
        return silog_loss
    if method.endswith("abs_rel"):
        return lambda x, y: jnp.mean(jnp.abs(x - y) / x)
    raise ValueError(f"Unknown supervised loss {method}")
