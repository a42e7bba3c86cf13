"""Depth metric parity against a numpy oracle that mirrors the reference."""
import jax.numpy as jnp
import numpy as np

from dro_sfm_tpu.training.metrics import (
    MetricsConfig,
    compute_depth_metrics,
    compute_pose_metrics,
)


def oracle_metrics(gt, pred, cfg, use_gt_scale):
    """Direct numpy transcription of the reference's per-sample loop
    (`/root/reference/dro_sfm/utils/depth.py:259-340`), same-resolution case."""
    b = gt.shape[0]
    acc = np.zeros(9)
    h, w = gt.shape[1], gt.shape[2]
    crop_mask = None
    if cfg.crop == "garg":
        crop_mask = np.zeros((h, w), dtype=bool)
        y1, y2 = int(0.40810811 * h), int(0.99189189 * h)
        x1, x2 = int(0.03594771 * w), int(0.96405229 * w)
        crop_mask[y1:y2, x1:x2] = True
    for i in range(b):
        g = gt[i, ..., 0]
        p = np.maximum(pred[i, ..., 0], 1e-6)
        valid = (g > cfg.min_depth) & (g < cfg.max_depth)
        if crop_mask is not None:
            valid &= crop_mask
        if valid.sum() == 0:
            continue
        g, p = g[valid], p[valid]
        if use_gt_scale:
            ratio = np.sort(g / p)
            med = ratio[(len(ratio) - 1) // 2]  # torch.median convention
            p = np.clip(p * med, cfg.min_depth, cfg.max_depth)
        p = np.clip(p, cfg.min_depth, cfg.max_depth)
        thresh = np.maximum(g / p, p / g)
        d = g - p
        ld = np.log(g) - np.log(p)
        acc += np.array([
            np.mean(np.abs(d) / g),
            np.mean(d ** 2 / g),
            np.sqrt(np.mean(d ** 2)),
            np.sqrt(np.mean(ld ** 2)),
            (thresh < 1.25).mean(),
            (thresh < 1.25 ** 2).mean(),
            (thresh < 1.25 ** 3).mean(),
            np.sqrt((ld ** 2).mean() - ld.sum() ** 2 / len(ld) ** 2),
            np.mean(np.abs(1 / p - 1 / g)),
        ])
    return acc / b


def test_metrics_match_oracle(rng):
    cfg = MetricsConfig(crop="", min_depth=0.2, max_depth=10.0)
    gt = rng.uniform(0.0, 12.0, size=(3, 20, 30, 1)).astype(np.float32)
    pred = rng.uniform(0.5, 8.0, size=(3, 20, 30, 1)).astype(np.float32)
    for scale in (False, True):
        ours = np.asarray(compute_depth_metrics(
            jnp.asarray(gt), jnp.asarray(pred), cfg, use_gt_scale=scale))
        expected = oracle_metrics(gt, pred, cfg, scale)
        np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)


def test_metrics_match_oracle_garg_crop(rng):
    cfg = MetricsConfig(crop="garg", min_depth=0.2, max_depth=80.0)
    gt = rng.uniform(0.0, 90.0, size=(2, 37, 122, 1)).astype(np.float32)
    pred = rng.uniform(1.0, 60.0, size=(2, 37, 122, 1)).astype(np.float32)
    ours = np.asarray(compute_depth_metrics(
        jnp.asarray(gt), jnp.asarray(pred), cfg, use_gt_scale=True))
    expected = oracle_metrics(gt, pred, cfg, True)
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)


def test_perfect_prediction_zero_error(rng):
    cfg = MetricsConfig(crop="", min_depth=0.2, max_depth=10.0)
    gt = rng.uniform(1.0, 9.0, size=(2, 16, 16, 1)).astype(np.float32)
    m = np.asarray(compute_depth_metrics(
        jnp.asarray(gt), jnp.asarray(gt), cfg, use_gt_scale=False))
    np.testing.assert_allclose(m[:4], 0.0, atol=1e-5)   # error metrics
    np.testing.assert_allclose(m[4:7], 1.0, atol=1e-6)  # a1-a3


def test_median_scaling_fixes_global_scale(rng):
    cfg = MetricsConfig(crop="", min_depth=0.2, max_depth=50.0)
    gt = rng.uniform(1.0, 9.0, size=(1, 16, 16, 1)).astype(np.float32)
    pred = gt / 3.0
    m = np.asarray(compute_depth_metrics(
        jnp.asarray(gt), jnp.asarray(pred), cfg, use_gt_scale=True))
    np.testing.assert_allclose(m[0], 0.0, atol=1e-5)


def test_pose_metrics_identity():
    gt = np.eye(4)[None, None].repeat(2, axis=1)
    gt[0, 0, :3, 3] = [1.0, 0.0, 0.0]
    m = compute_pose_metrics(gt, gt)
    np.testing.assert_allclose(m, 0.0, atol=1e-4)


def test_pose_metrics_known_rotation():
    gt = np.eye(4)[None, None]
    gt[0, 0, :3, 3] = [0.0, 0.0, 1.0]
    pred = gt.copy()
    a = np.radians(10.0)
    pred[0, 0, :3, :3] = np.array(
        [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])
    m = compute_pose_metrics(gt, pred)
    np.testing.assert_allclose(m[0], 10.0, atol=1e-3)
