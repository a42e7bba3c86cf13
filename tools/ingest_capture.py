"""Capture ingestion: quaternion pose CSV -> per-frame 4x4 pose txts.

Rebuild of the fork-specific Kneron/Matterport capture pipeline
(`/root/reference/dro_sfm/kneron/config_dataset.py:33+`): takes a capture
directory with `cam_left/*.jpg`, `depth/*.png` and a trajectory CSV of rows
``timestamp, px, py, pz, qx, qy, qz, qw``, matches frames to poses by
nearest timestamp, writes `pose/<frame>.txt` 4x4 camera-to-world matrices,
and emits a split file — producing the exact on-disk layout
`MatterportDataset` consumes.

Usage:
    python tools/ingest_capture.py --capture /data/cap01 \
        --trajectory /data/cap01/traj.csv --scene cap01 \
        --split-out /data/split.txt [--depth-clip 10.0]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def quat_to_matrix(qx, qy, qz, qw) -> np.ndarray:
    """Quaternion (x, y, z, w) -> rotation matrix
    (`config_dataset.py:33-58` convention)."""
    q = np.array([qw, qx, qy, qz], dtype=np.float64)
    two_s = 2.0 / (q @ q)
    r, i, j, k = q
    return np.array([
        [1 - two_s * (j * j + k * k), two_s * (i * j - k * r),
         two_s * (i * k + j * r)],
        [two_s * (i * j + k * r), 1 - two_s * (i * i + k * k),
         two_s * (j * k - i * r)],
        [two_s * (i * k - j * r), two_s * (j * k + i * r),
         1 - two_s * (i * i + j * j)],
    ])


def load_trajectory(path: str) -> np.ndarray:
    """CSV rows (ts, px, py, pz, qx, qy, qz, qw) -> [N, 8] floats."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.replace(",", " ").split()
            if len(parts) >= 8:
                rows.append([float(x) for x in parts[:8]])
    return np.asarray(rows)


def main():
    p = argparse.ArgumentParser(description="capture -> matterport layout")
    p.add_argument("--capture", required=True,
                   help="capture dir with cam_left/ and depth/")
    p.add_argument("--trajectory", required=True, help="pose CSV")
    p.add_argument("--scene", required=True, help="scene name for the split")
    p.add_argument("--split-out", required=True)
    p.add_argument("--max-dt", type=float, default=0.05,
                   help="max frame/pose timestamp gap (s)")
    args = p.parse_args()

    traj = load_trajectory(args.trajectory)
    ts = traj[:, 0]
    cam_dir = os.path.join(args.capture, "cam_left")
    pose_dir = os.path.join(args.capture, "pose")
    os.makedirs(pose_dir, exist_ok=True)

    frames = sorted(f for f in os.listdir(cam_dir) if f.endswith(".jpg"))
    kept = []
    for fname in frames:
        # Frame timestamps are encoded in the filename (ms or ns ticks).
        stamp = float(os.path.splitext(fname)[0])
        for scale in (1.0, 1e-3, 1e-6, 1e-9):
            i = int(np.argmin(np.abs(ts - stamp * scale)))
            if abs(ts[i] - stamp * scale) <= args.max_dt:
                break
        else:
            continue
        _, px, py, pz, qx, qy, qz, qw = traj[i]
        T = np.eye(4)
        T[:3, :3] = quat_to_matrix(qx, qy, qz, qw)
        T[:3, 3] = [px, py, pz]
        np.savetxt(os.path.join(pose_dir, fname.replace(".jpg", ".txt")), T)
        kept.append(fname)

    with open(args.split_out, "w") as f:
        for fname in kept:
            f.write(f"{args.scene}/cam_left {fname}\n")
    print(f"matched {len(kept)}/{len(frames)} frames; "
          f"poses in {pose_dir}, split in {args.split_out}")


if __name__ == "__main__":
    main()
