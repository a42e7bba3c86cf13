"""Annotated multi-panel demo-video composition for the SfM inference app.

Rebuild of the reference's flagship demo rendering
(`/root/reference/scripts/infer_video.py:700-860`): a 4x2 panel canvas with
header/footer annotation bands (timestamp/host/git provenance, model path,
run parameters), per-frame panels for RGB / predicted depth / GT depth /
depth-validity mask, and trajectory visualizations for the pred-vs-GT mode
combinations (with ATE after Umeyama alignment); plus the pose-list OBJ
export. The reference renders trajectories through a live vtk viewer;
here they are drawn headlessly with cv2 so the composition is
deterministic and CI-testable.
"""
from __future__ import annotations

import datetime
import os
import socket
from typing import Dict, List, Optional, Sequence

import numpy as np

from dro_sfm_tpu.visualization.trajectory import (
    absolute_trajectory_error,
    positions_from_poses,
    umeyama_alignment,
)

_BLUE = (90, 160, 255)
_RED = (255, 90, 90)
_GREEN = (80, 220, 120)
_YELLOW = (255, 220, 80)


def poses_to_obj(path: str, poses: Sequence[np.ndarray]) -> None:
    """Camera-center OBJ export of a trajectory
    (`infer_video.py:712-720`): one vertex per pose plus a triangle fan so
    mesh viewers render the path."""
    with open(path, "w") as f:
        for p in poses:
            f.write(f"v {p[0, 3]} {p[1, 3]} {p[2, 3]}\n")
        for i in range(1, len(poses) - 1, 2):
            f.write(f"f {i} {i + 1} {i + 2}\n")


def load_gt_poses(pose_dir: str, frame_files: Sequence[str],
                  ) -> Optional[List[np.ndarray]]:
    """Per-frame GT pose txts ([4,4], scannet/matterport layout) matched by
    frame basename. Returns None unless every frame has a finite pose
    (`infer_video.py:575-583` skips frames without GT)."""
    poses = []
    for f in frame_files:
        base = os.path.splitext(os.path.basename(f))[0]
        p = os.path.join(pose_dir, base + ".txt")
        if not os.path.exists(p):
            return None
        pose = np.genfromtxt(p).reshape(4, 4)
        if not np.all(np.isfinite(pose)):
            return None
        poses.append(pose.astype(np.float64))
    return poses


def draw_trajectory_panel(poses: Sequence[np.ndarray], upto: int,
                          size=(240, 320), axes=(0, 2),
                          color=_BLUE, overlay: Optional[np.ndarray] = None,
                          overlay_color=_RED,
                          label: str = "") -> np.ndarray:
    """Top-down trajectory panel drawn with cv2 (no matplotlib per frame).

    ``poses`` [T,4,4] camera-to-world; draws positions[:upto+1] over the
    bounds of the FULL trajectory so the view is stable across video
    frames. ``overlay`` [T,3] draws a second (e.g. GT) path in full.
    """
    import cv2
    h, w = size
    img = np.full((h, w, 3), 24, np.uint8)
    pts = positions_from_poses(poses)[:, list(axes)]
    ref = pts if overlay is None else np.concatenate(
        [pts, overlay[:, list(axes)]], axis=0)
    lo, hi = ref.min(axis=0), ref.max(axis=0)
    span = np.maximum(hi - lo, 1e-6)
    margin = 20

    def to_px(p):
        q = (p - lo) / span
        x = (margin + q[..., 0] * (w - 2 * margin)).astype(np.int32)
        y = (h - margin - q[..., 1] * (h - 2 * margin)).astype(np.int32)
        return np.stack([x, y], axis=-1)

    if overlay is not None and len(overlay):
        cv2.polylines(img, [to_px(overlay[:, list(axes)])], False,
                      overlay_color[::-1], 1, cv2.LINE_AA)
    seg = to_px(pts[:upto + 1])
    if len(seg) > 1:
        cv2.polylines(img, [seg], False, color[::-1], 2, cv2.LINE_AA)
    cv2.circle(img, tuple(seg[-1]), 4, _GREEN[::-1], -1)
    if label:
        cv2.putText(img, label, (8, 20), cv2.FONT_HERSHEY_SIMPLEX, 0.45,
                    (255, 255, 255), 1, cv2.LINE_AA)
    return img[..., ::-1]  # give back RGB


class DemoVideoComposer:
    """Annotated 4x2-panel frame composer (`infer_video.py:723-846`).

    Panels: (a) RGB + frame text, (b) depth-validity mask overlay,
    (c) predicted depth, (d) GT depth (dimmed placeholder when absent),
    (e) traj pred, (f) traj pred vs GT + ATE, (g) traj GT,
    (h) accumulated cloud (top-down scatter).
    """

    HEADER = 64
    FOOTER = 40
    GAP = 8

    def __init__(self, shape, model_path: str = "", data_path: str = "",
                 sample_rate: int = 1, max_frames: int = 0, fps: float = 10.0,
                 git_sha: str = ""):
        self.h, self.w = shape
        self.info = {
            "datetime": datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S"),
            "host": socket.gethostname(),
            "git": git_sha or "n/a",
            "model": model_path,
            "data": data_path,
            "sample_rate": sample_rate,
            "max_frames": max_frames,
            "fps": fps,
        }

    @property
    def frame_size(self):
        """(height, width) of the composed canvas."""
        ph = self.h // 2
        pw = self.w // 2
        return (self.HEADER + 2 * ph + 3 * self.GAP + self.FOOTER,
                4 * pw + 5 * self.GAP)

    def _annotation_bands(self, canvas):
        import cv2
        i = self.info
        cv2.putText(canvas, f"{i['datetime']} @ {i['host']} @ {i['git']}",
                    (10, 22), cv2.FONT_HERSHEY_SIMPLEX, 0.5, _RED[::-1], 1,
                    cv2.LINE_AA)
        cv2.putText(canvas, f"model: {i['model']}", (10, 42),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, _YELLOW[::-1], 1,
                    cv2.LINE_AA)
        cv2.putText(canvas, f"data: {i['data']}", (10, 60),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, _YELLOW[::-1], 1,
                    cv2.LINE_AA)
        fy = self.frame_size[0] - 14
        cv2.putText(canvas,
                    f"sample_rate: {i['sample_rate']}   max_frames: "
                    f"{i['max_frames']}   fps: {i['fps']:.1f}",
                    (10, fy), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                    _GREEN[::-1], 1, cv2.LINE_AA)

    def compose(self, panels: Dict[str, np.ndarray], frame_idx: int,
                frame_name: str = "", ate: Optional[float] = None,
                ) -> np.ndarray:
        """Compose one canvas (RGB uint8). ``panels`` maps panel keys
        ('rgb', 'mask', 'depth', 'depth_gt', 'traj', 'traj_vs_gt',
        'traj_gt', 'cloud') to images; missing keys render dimmed."""
        import cv2
        ph, pw = self.h // 2, self.w // 2
        H, W = self.frame_size
        canvas = np.full((H, W, 3), 48, np.uint8)
        canvas[:self.HEADER] = 28
        canvas[H - self.FOOTER:] = 28
        self._annotation_bands(canvas)

        layout = [
            ("rgb", 0, 0, f"(a) rgb [{frame_idx:4d}] {frame_name}"),
            ("mask", 0, 1, "(b) depth-validity mask"),
            ("traj", 0, 2, "(c) traj pred"),
            ("traj_vs_gt", 0, 3,
             "(d) traj pred vs GT" if ate is None
             else f"(d) pred vs GT  ATE {ate:.3f}m"),
            ("depth", 1, 0, "(e) predicted depth"),
            ("depth_gt", 1, 1, "(f) groundtruth depth"),
            ("traj_gt", 1, 2, "(g) traj GT"),
            ("cloud", 1, 3, "(h) fused cloud (top-down)"),
        ]
        for key, r, c, label in layout:
            img = panels.get(key)
            if img is None:
                img = np.full((ph, pw, 3), 36, np.uint8)
            else:
                if img.dtype != np.uint8:
                    img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
                if img.ndim == 2:
                    img = np.repeat(img[..., None], 3, axis=-1)
                img = cv2.resize(img, (pw, ph))
            img = np.ascontiguousarray(img)
            cv2.putText(img, label, (6, 18), cv2.FONT_HERSHEY_SIMPLEX,
                        0.45, (255, 255, 255), 1, cv2.LINE_AA)
            y = self.HEADER + self.GAP + r * (ph + self.GAP)
            x = self.GAP + c * (pw + self.GAP)
            canvas[y:y + ph, x:x + pw] = img
        return canvas


def cloud_topdown_panel(points: np.ndarray, colors: np.ndarray,
                        size=(240, 320), axes=(0, 2),
                        max_points: int = 60000) -> np.ndarray:
    """Top-down scatter of the accumulated colored cloud — the headless
    stand-in for the reference's cinematic vtk render."""
    h, w = size
    img = np.full((h, w, 3), 24, np.uint8)
    if len(points) == 0:
        return img
    if len(points) > max_points:
        sel = np.random.default_rng(0).choice(len(points), max_points,
                                              replace=False)
        points, colors = points[sel], colors[sel]
    p = points[:, list(axes)]
    lo, hi = np.percentile(p, 2, axis=0), np.percentile(p, 98, axis=0)
    span = np.maximum(hi - lo, 1e-6)
    q = np.clip((p - lo) / span, 0, 1)
    x = (q[:, 0] * (w - 1)).astype(np.int32)
    y = ((1 - q[:, 1]) * (h - 1)).astype(np.int32)
    c = (np.clip(colors, 0, 1) * 255).astype(np.uint8)
    img[y, x] = c
    return img


def align_to_gt(pred_poses: Sequence[np.ndarray],
                gt_poses: Sequence[np.ndarray]):
    """Umeyama-align predicted camera centers to GT. Returns (aligned
    positions [T,3], ATE-RMSE)."""
    p = positions_from_poses(pred_poses)
    g = positions_from_poses(gt_poses)
    s, R, t = umeyama_alignment(p, g, with_scale=True)
    aligned = (s * (R @ p.T)).T + t
    ate = absolute_trajectory_error(pred_poses, gt_poses, align_scale=True)
    return aligned, ate
