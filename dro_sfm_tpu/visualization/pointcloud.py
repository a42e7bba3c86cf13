"""Point-cloud export: depth + RGB + pose -> .ply / .obj (no vtk needed).

Rebuild of the reference's point-cloud exporters
(`/root/reference/dro_sfm/visualization/pointcloud_scannet.py:38`,
`pointcloud_matterport.py:185`, `scripts/infer.py:27-75`
generate_pointcloud), dependency-free so it runs in CI.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def depth_to_points(depth: np.ndarray, K: np.ndarray,
                    pose_c2w: Optional[np.ndarray] = None,
                    rgb: Optional[np.ndarray] = None):
    """Unproject a depth map [H,W] to world points.

    Returns (points [M,3], colors [M,3] uint8 or None) for valid
    (depth > 0) pixels. ``pose_c2w`` maps camera -> world (identity if
    None); rgb is [H,W,3] float [0,1] or uint8.
    """
    h, w = depth.shape[:2]
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pix = np.stack([xs, ys, np.ones_like(xs)], axis=-1).reshape(-1, 3)
    d = depth.reshape(-1)
    valid = d > 0
    pts = (pix[valid] @ np.linalg.inv(K).T) * d[valid, None]
    if pose_c2w is not None:
        pts = pts @ pose_c2w[:3, :3].T + pose_c2w[:3, 3]
    colors = None
    if rgb is not None:
        c = rgb.reshape(-1, 3)[valid]
        colors = (c * 255).astype(np.uint8) if c.dtype != np.uint8 else c
    return pts, colors


def write_ply(path: str, points: np.ndarray,
              colors: Optional[np.ndarray] = None) -> None:
    """ASCII PLY writer (parity with `infer.py:27-75`)."""
    n = points.shape[0]
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\n"
                    "property uchar blue\n")
        f.write("end_header\n")
        if colors is not None:
            for p, c in zip(points, colors):
                f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                        f"{int(c[0])} {int(c[1])} {int(c[2])}\n")
        else:
            for p in points:
                f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")


def write_obj(path: str, points: np.ndarray,
              colors: Optional[np.ndarray] = None) -> None:
    """OBJ vertex-cloud writer (colors as per-vertex extensions)."""
    with open(path, "w") as f:
        if colors is not None:
            for p, c in zip(points, colors):
                f.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                        f"{c[0] / 255:.4f} {c[1] / 255:.4f} {c[2] / 255:.4f}\n")
        else:
            for p in points:
                f.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")


def export_pointcloud(path: str, depth: np.ndarray, K: np.ndarray,
                      pose_c2w: Optional[np.ndarray] = None,
                      rgb: Optional[np.ndarray] = None) -> int:
    """Unproject + write by extension (.ply/.obj). Returns point count."""
    pts, colors = depth_to_points(depth, K, pose_c2w, rgb)
    if path.endswith(".ply"):
        write_ply(path, pts, colors)
    elif path.endswith(".obj"):
        write_obj(path, pts, colors)
    else:
        raise ValueError(f"Unknown point cloud format: {path}")
    return pts.shape[0]
