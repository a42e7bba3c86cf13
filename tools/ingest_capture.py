"""Capture ingestion: quaternion pose CSV -> per-frame 4x4 pose txts.

Rebuild of the fork-specific Kneron/Matterport capture pipeline
(`/root/reference/dro_sfm/kneron/config_dataset.py:33+`): takes a capture
directory with `cam_left/*.jpg`, `depth/*.png` and a trajectory CSV of rows
``timestamp, px, py, pz, qx, qy, qz, qw``, matches frames to poses by
nearest timestamp, writes `pose/<frame>.txt` 4x4 camera-to-world matrices,
and emits a split file — producing the exact on-disk layout
`MatterportDataset` consumes.

Beyond pose matching it covers the rest of the reference pipeline:
``--check`` is the data-consistency census (`config_dataset.py:189-221`
``check_data``: missing depths, unmatched frames, invalid poses),
``--filter`` runs the drop/split quality pass from
`matterport_filter.py:92-170` (drop frames with >40% untrusted depth or
broken poses, split where inter-frame motion jumps), and
``--preview-video`` renders the rgb|depth inspection video
(`config_dataset.py:84-110,264-291` ``synthetic_canvas``/``synthetic_video``).

Usage:
    python tools/ingest_capture.py --capture /data/cap01 \
        --trajectory /data/cap01/traj.csv --scene cap01 \
        --split-out /data/split.txt [--check] [--filter] \
        [--preview-video /data/cap01/preview.mp4]
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


# Gazebo RoboMaker sim-capture constants
# (`/root/reference/dro_sfm/visualization/gazebo_config.py:30-175`):
# camera intrinsics and the body-frame chain camera -> IMU -> GT tracker.
GAZEBO_INTRINSICS = np.array([
    [530.4669406576809, 0.0, 320.5],
    [0.0, 530.4669406576809, 240.5],
    [0.0, 0.0, 1.0]])


def _translation_T(x, y, z):
    T = np.eye(4)
    T[:3, 3] = [x, y, z]
    return T


GAZEBO_CAM2GT = _translation_T(0, 0, -0.068) @ _translation_T(-0.076, 0, -0.025)
# Axis remap between the camera optical frame (z forward) and the gazebo
# body/world frame (`gazebo_config.py:72-100` cam_to_gazebo_world). The
# reference only explores this in its debug script and never applies it in
# ingestion; exposed here behind --apply-cam2world for captures whose
# tracker rotations are body-frame.
GAZEBO_CAM2WORLD = np.array([
    [0.0, 0.0, -1.0, 0.0],
    [1.0, 0.0, 0.0, 0.0],
    [0.0, -1.0, 0.0, 0.0],
    [0.0, 0.0, 0.0, 1.0]])

PRESETS = {
    # preset -> (intrinsics or None, pose transform applied as T @ cam2gt)
    "none": (None, None),
    "gazebo": (GAZEBO_INTRINSICS, GAZEBO_CAM2GT),
}


def census(capture: str, frames, kept, poses) -> dict:
    """Data-consistency counts (`config_dataset.py:189-221` check_data)."""
    from dro_sfm_tpu.data.depth_filter import is_invalid_pose
    depth_dir = os.path.join(capture, "depth")
    missing_depth = [
        f for f in kept
        if not os.path.exists(
            os.path.join(depth_dir, os.path.splitext(f)[0] + ".png"))]
    bad_poses = [f for f, T in zip(kept, poses) if is_invalid_pose(T)]
    report = {
        "frames": len(frames),
        "pose_matched": len(kept),
        "unmatched": len(frames) - len(kept),
        "missing_depth": len(missing_depth),
        "invalid_pose": len(bad_poses),
    }
    for k, v in report.items():
        print(f"  check {k}: {v}")
    for f in missing_depth[:10]:
        print(f"    no depth: {f}")
    return report


def quality_filter(capture: str, kept, poses):
    """Drop/split pass -> (keep mask, segment ids)
    (`matterport_filter.py:92-150`)."""
    from dro_sfm_tpu.data.depth_filter import (
        filter_sequence, invalid_depth_fraction)
    depth_dir = os.path.join(capture, "depth")
    fracs = []
    for fname in kept:
        dp = os.path.join(depth_dir, os.path.splitext(fname)[0] + ".png")
        if os.path.exists(dp):
            import cv2
            depth_mm = cv2.imread(dp, cv2.IMREAD_ANYDEPTH)
            fracs.append(invalid_depth_fraction(depth_mm)
                         if depth_mm is not None else 1.0)
        else:
            fracs.append(0.0)  # no depth channel: pose-only filtering
    return filter_sequence(poses, fracs)


def preview_video(capture: str, kept, out_path: str, fps: int = 10) -> int:
    """rgb|depth-colormap inspection video (`config_dataset.py:264-291`)."""
    import cv2
    from dro_sfm_tpu.utils.depth import viz_inv_depth
    depth_dir = os.path.join(capture, "depth")
    writer = None
    n = 0
    for fname in kept:
        rgb = cv2.imread(os.path.join(capture, "cam_left", fname))
        if rgb is None:
            continue
        dp = os.path.join(depth_dir, os.path.splitext(fname)[0] + ".png")
        depth_mm = cv2.imread(dp, cv2.IMREAD_ANYDEPTH) \
            if os.path.exists(dp) else None
        if depth_mm is not None:
            depth_m = depth_mm.astype(np.float32) / 1000.0
            inv = np.where(depth_m > 0, 1.0 / np.maximum(depth_m, 1e-6), 0.0)
            viz = (viz_inv_depth(inv) * 255).astype(np.uint8)[..., ::-1]
            viz = cv2.resize(viz, (rgb.shape[1], rgb.shape[0]))
        else:
            viz = np.zeros_like(rgb)
        canvas = np.concatenate([rgb, viz], axis=1)
        cv2.putText(canvas, fname, (8, 24), cv2.FONT_HERSHEY_SIMPLEX,
                    0.7, (255, 255, 255), 2)
        if writer is None:
            writer = cv2.VideoWriter(
                out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                (canvas.shape[1], canvas.shape[0]))
        writer.write(canvas)
        n += 1
    if writer is not None:
        writer.release()
    return n


def main():
    p = argparse.ArgumentParser(description="capture -> matterport layout")
    p.add_argument("--capture", required=True,
                   help="capture dir with cam_left/ and depth/")
    p.add_argument("--trajectory", required=True, help="pose CSV")
    p.add_argument("--scene", required=True, help="scene name for the split")
    p.add_argument("--split-out", required=True)
    p.add_argument("--max-dt", type=float, default=0.05,
                   help="max frame/pose timestamp gap (s)")
    p.add_argument("--check", action="store_true",
                   help="print the data-consistency census")
    p.add_argument("--filter", action="store_true",
                   help="apply the depth/pose quality drop+split pass to "
                        "the emitted split")
    p.add_argument("--min-segment", type=int, default=3,
                   help="with --filter: drop kept segments shorter than this")
    p.add_argument("--preview-video", default="",
                   help="write an rgb|depth inspection mp4 here")
    p.add_argument("--preset", choices=sorted(PRESETS), default="none",
                   help="capture rig preset: 'gazebo' writes the RoboMaker "
                        "sim intrinsics and applies the camera->GT-tracker "
                        "translation chain to trajectory poses")
    p.add_argument("--apply-cam2world", action="store_true",
                   help="also apply the optical-frame axis remap "
                        "(GAZEBO_CAM2WORLD) for captures whose tracker "
                        "rotations are gazebo body-frame; off by default "
                        "(the reference ingestion never applies it)")
    args = p.parse_args()

    preset_K, preset_T = PRESETS[args.preset]
    if args.apply_cam2world:
        preset_T = (GAZEBO_CAM2WORLD if preset_T is None
                    else preset_T @ GAZEBO_CAM2WORLD)

    traj = load_trajectory(args.trajectory)
    ts = traj[:, 0]
    cam_dir = os.path.join(args.capture, "cam_left")
    pose_dir = os.path.join(args.capture, "pose")
    os.makedirs(pose_dir, exist_ok=True)

    frames = sorted(f for f in os.listdir(cam_dir) if f.endswith(".jpg"))
    kept, kept_poses = [], []
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
        if preset_T is not None:
            T = T @ preset_T  # tracker pose -> camera pose
        np.savetxt(os.path.join(pose_dir, fname.replace(".jpg", ".txt")), T)
        kept.append(fname)
        kept_poses.append(T)

    if preset_K is not None:
        np.savetxt(os.path.join(args.capture, "intrinsics.txt"), preset_K)

    if args.check:
        census(args.capture, frames, kept, kept_poses)

    if args.filter:
        from dro_sfm_tpu.data.depth_filter import split_lines_from_segments
        keep, seg = quality_filter(args.capture, kept, kept_poses)
        lines = split_lines_from_segments(
            kept, keep, seg, f"{args.scene}/cam_left",
            min_segment=args.min_segment)
        print(f"filter kept {int(keep.sum())}/{len(kept)} frames in "
              f"{int(seg.max()) + 1 if keep.any() else 0} segments; "
              f"{len(lines)} split lines after min-segment")
    else:
        lines = [f"{args.scene}/cam_left {fname}" for fname in kept]

    with open(args.split_out, "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))

    if args.preview_video:
        n = preview_video(args.capture, kept, args.preview_video)
        print(f"preview video: {n} frames -> {args.preview_video}")

    print(f"matched {len(kept)}/{len(frames)} frames; "
          f"poses in {pose_dir}, split in {args.split_out}")


if __name__ == "__main__":
    main()
