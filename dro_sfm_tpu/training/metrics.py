"""Depth and pose evaluation metrics (jit-friendly, masked).

Rebuild of the metric functions in `/root/reference/dro_sfm/utils/depth.py`:

* `compute_depth_metrics` (`:259-340`): 9 depth metrics per batch with
  min/max-depth validity masking, optional garg / eigen_nyu crops, and
  optional GT median scaling;
* `compute_depth_metrics_demon` (`:343-397`): translation-norm-normalized
  variant for two-view DeMoN evaluation;
* `compute_pose_metrics` (`:400-420`): rotation angle (deg), translation
  angle (deg) and scale-fitted translation error (cm).

All statistics are masked reductions over static shapes. The median follows
torch's lower-middle element convention so median-scaled numbers can be
validated against the reference's README table.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dro_sfm_tpu.ops.image import resize_bilinear

DEPTH_METRIC_NAMES = ("abs_rel", "sq_rel", "rmse", "rmse_log",
                      "a1", "a2", "a3", "SILog", "l1_inv")
POSE_METRIC_NAMES = ("rot_ang", "t_ang", "t_cm")
ALL_METRIC_NAMES = DEPTH_METRIC_NAMES + POSE_METRIC_NAMES
METRIC_MODES = ("", "_pp", "_gt", "_pp_gt")


@dataclasses.dataclass(frozen=True)
class MetricsConfig:
    """`config.model.params` (`default_config.py:81-84`)."""
    crop: str = ""
    min_depth: float = 0.0
    max_depth: float = 80.0


def _crop_mask(h: int, w: int, crop: str) -> Optional[np.ndarray]:
    """Evaluation crop masks (`utils/depth.py:288-299`)."""
    if crop == "garg":
        y1, y2 = int(0.40810811 * h), int(0.99189189 * h)
        x1, x2 = int(0.03594771 * w), int(0.96405229 * w)
    elif crop == "eigen_nyu":
        y1, y2, x1, x2 = 20, 459, 24, 615
    else:
        return None
    m = np.zeros((h, w), dtype=bool)
    m[y1:y2, x1:x2] = True
    return m


def masked_median(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median of ``values`` where ``mask`` (flat arrays), lower-middle
    convention (torch.median parity)."""
    big = jnp.asarray(jnp.finfo(values.dtype).max, values.dtype)
    filled = jnp.where(mask, values, big)
    sorted_vals = jnp.sort(filled)
    count = mask.sum()
    idx = jnp.maximum((count - 1) // 2, 0)
    return sorted_vals[idx]


def _single_depth_metrics(gt: jnp.ndarray, pred: jnp.ndarray,
                          valid: jnp.ndarray, cfg: MetricsConfig,
                          use_gt_scale: bool) -> jnp.ndarray:
    """Metrics for one sample. gt/pred/valid are flat [H*W] arrays."""
    count = valid.sum()
    safe_count = jnp.maximum(count, 1)
    vf = valid.astype(gt.dtype)

    if use_gt_scale:
        ratio = jnp.where(valid, gt / pred, 1.0)
        scale = masked_median(ratio, valid)
        pred = jnp.clip(pred * scale, cfg.min_depth, cfg.max_depth)
    pred = jnp.clip(pred, cfg.min_depth, cfg.max_depth)

    def mmean(x):
        return (x * vf).sum() / safe_count

    # Guard logs/divisions on masked-out entries.
    gt_s = jnp.where(valid, gt, 1.0)
    pred_s = jnp.where(valid, pred, 1.0)

    thresh = jnp.maximum(gt_s / pred_s, pred_s / gt_s)
    a1 = mmean((thresh < 1.25).astype(gt.dtype))
    a2 = mmean((thresh < 1.25 ** 2).astype(gt.dtype))
    a3 = mmean((thresh < 1.25 ** 3).astype(gt.dtype))

    diff = gt_s - pred_s
    abs_rel = mmean(jnp.abs(diff) / gt_s)
    sq_rel = mmean(diff * diff / gt_s)
    rmse = jnp.sqrt(mmean(diff * diff))
    log_diff = jnp.log(gt_s) - jnp.log(pred_s)
    rmse_log = jnp.sqrt(mmean(log_diff * log_diff))
    l1_inv = mmean(jnp.abs(1.0 / pred_s - 1.0 / gt_s))
    silog = jnp.sqrt(jnp.maximum(
        mmean(log_diff * log_diff)
        - ((log_diff * vf).sum() ** 2) / (safe_count.astype(gt.dtype) ** 2),
        0.0))

    metrics = jnp.stack([abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3,
                         silog, l1_inv])
    # Reference skips zero-valid samples (contributes 0 to the batch mean).
    return jnp.where(count > 0, metrics, jnp.zeros_like(metrics))


def compute_depth_metrics(gt: jnp.ndarray, pred: jnp.ndarray,
                          cfg: MetricsConfig, use_gt_scale: bool = True,
                          gt_pose: Optional[jnp.ndarray] = None,
                          demon_scaling: bool = False,
                          reduce: bool = True) -> jnp.ndarray:
    """Batch depth metrics: mean over samples [9], or per-sample [B,9] with
    ``reduce=False`` (used for exact dataset-mean aggregation over padded
    eval batches).

    gt [B,Hg,Wg,1]; pred [B,H,W,1] (interpolated to gt resolution
    align_corners=True like `utils/depth.py:285`). With ``demon_scaling``
    the GT is first divided by the first context translation norm
    (`:343-397`; requires ``gt_pose`` [B,N,4,4]).
    """
    b, hg, wg = gt.shape[0], gt.shape[1], gt.shape[2]
    pred = resize_bilinear(pred, (hg, wg), align_corners=True)
    pred = jnp.maximum(pred, 1e-6)

    valid = (gt > cfg.min_depth) & (gt < cfg.max_depth)
    cm = _crop_mask(hg, wg, cfg.crop)
    if cm is not None and not demon_scaling:
        valid = valid & jnp.asarray(cm)[None, :, :, None]

    gt_flat = gt.reshape(b, -1)
    pred_flat = pred.reshape(b, -1)
    valid_flat = valid.reshape(b, -1)

    if demon_scaling and use_gt_scale:
        t_norm = jnp.linalg.norm(gt_pose[:, 0, :3, 3], axis=-1)  # [B]
        gt_flat = gt_flat / t_norm[:, None]

    per_sample = jax.vmap(
        lambda g, p, v: _single_depth_metrics(g, p, v, cfg, use_gt_scale)
    )(gt_flat, pred_flat, valid_flat)
    return per_sample.mean(axis=0) if reduce else per_sample


def compute_pose_metrics(gt_pose: np.ndarray, pred_pose: np.ndarray) -> np.ndarray:
    """Pose metrics [3] for the first sample / first context view.

    gt_pose [B,N,4,4] target->context GT; pred_pose [B,N,4,4] predictions.
    Parity: `utils/depth.py:400-420` (numpy, host-side).
    """
    gt = np.asarray(gt_pose)[0, 0]
    pr = np.asarray(pred_pose)[0, 0]
    R1, t1 = gt[:3, :3], gt[:3, 3]
    R2, t2 = pr[:3, :3], pr[:3, 3]

    costheta = (np.trace(R1.T @ R2) - 1.0) / 2.0
    rdeg = np.degrees(np.arccos(np.clip(costheta, -1.0, 1.0)))

    t1mag = np.sqrt(t1 @ t1)
    t2mag = np.sqrt(t2 @ t2)
    cost = np.clip((t1 @ t2) / max(t1mag * t2mag, 1e-12), -1.0, 1.0)
    tdeg = np.degrees(np.arccos(cost))

    a = (t1 @ t2) / max(t2 @ t2, 1e-12)
    tcm = 100.0 * np.sqrt(np.sum((t1 - a * t2) ** 2))
    return np.array([rdeg, tdeg, tcm], dtype=np.float32)
