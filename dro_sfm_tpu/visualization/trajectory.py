"""Trajectory tools: alignment, ATE, 2D/3D plots.

Rebuild of `/root/reference/dro_sfm/visualization/viz_trajectory.py:80-319`
plus the trajectory-evaluation math the reference's north-star metric (ATE)
needs: Umeyama similarity alignment and absolute trajectory error.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def positions_from_poses(poses: Sequence[np.ndarray]) -> np.ndarray:
    """[T,4,4] camera-to-world poses -> positions [T,3]."""
    return np.asarray([p[:3, 3] for p in poses])


def umeyama_alignment(x: np.ndarray, y: np.ndarray, with_scale: bool = True):
    """Least-squares similarity transform aligning x -> y ([N,3] each).

    Returns (scale, R [3,3], t [3]) minimizing ||y - (s R x + t)||^2.
    """
    mu_x = x.mean(axis=0)
    mu_y = y.mean(axis=0)
    xc = x - mu_x
    yc = y - mu_y
    cov = yc.T @ xc / x.shape[0]
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_x = (xc ** 2).sum() / x.shape[0]
    scale = float(np.trace(np.diag(D) @ S) / var_x) if with_scale else 1.0
    t = mu_y - scale * R @ mu_x
    return scale, R, t


def absolute_trajectory_error(pred: Sequence[np.ndarray],
                              gt: Sequence[np.ndarray],
                              align_scale: bool = True) -> float:
    """ATE-RMSE between predicted and GT camera-to-world trajectories,
    after Umeyama (sim3 or se3) alignment. The north-star trajectory metric
    (BASELINE.md)."""
    p = positions_from_poses(pred)
    g = positions_from_poses(gt)
    assert p.shape == g.shape, (p.shape, g.shape)
    s, R, t = umeyama_alignment(p, g, with_scale=align_scale)
    aligned = (s * (R @ p.T)).T + t
    return float(np.sqrt(np.mean(np.sum((aligned - g) ** 2, axis=1))))


def plot_trajectory(path: str, poses: Sequence[np.ndarray],
                    gt_poses: Optional[Sequence[np.ndarray]] = None,
                    axes=(0, 2), title: str = "trajectory") -> None:
    """Top-down 2D trajectory plot saved as png
    (`viz_trajectory.py:80-200`). ``axes`` selects the ground plane
    (x, z by default for forward-moving cameras)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    p = positions_from_poses(poses)
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.plot(p[:, axes[0]], p[:, axes[1]], "b-", label="pred", linewidth=1.5)
    ax.scatter(p[0, axes[0]], p[0, axes[1]], c="g", marker="o", label="start")
    if gt_poses is not None:
        g = positions_from_poses(gt_poses)
        ax.plot(g[:, axes[0]], g[:, axes[1]], "r--", label="gt", linewidth=1.5)
    ax.set_aspect("equal")
    ax.legend()
    ax.set_title(title)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
