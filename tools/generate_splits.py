"""Dataset split generation and filtering.

Rebuild of the reference's offline split tooling
(`/root/reference/dro_sfm/datasets/matterport_split_gen.py` (379),
`matterport_filter.py` (270), and the scannet folder-scan branch in
`scannet_dataset.py:92-114`): scan a scene tree, filter frames by pose
validity and motion magnitude, and write train/test split files.

Usage:
    python tools/generate_splits.py --root /data/scannet/scans \
        --layout scannet --out splits/train_split.txt \
        [--test-scenes splits/test_scenes.txt] [--max-rot 0.5 --max-trans 1.0]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LAYOUTS = {
    "scannet": {"image_dir": "color", "pose_dir": "pose", "ext": ".jpg"},
    "matterport": {"image_dir": "cam_left", "pose_dir": "pose", "ext": ".jpg"},
}


def pose_ok(pose: np.ndarray) -> bool:
    """Pose validity: finite and a proper rigid transform
    (`depth_filter.py` pose validity)."""
    if not np.all(np.isfinite(pose)):
        return False
    R = pose[:3, :3]
    return abs(np.linalg.det(R) - 1.0) < 1e-2


def motion_ok(prev: np.ndarray, cur: np.ndarray,
              max_rot: float, max_trans: float) -> bool:
    rel = np.linalg.inv(prev) @ cur
    angle = np.arccos(np.clip((np.trace(rel[:3, :3]) - 1) / 2, -1, 1))
    return angle < max_rot and np.linalg.norm(rel[:3, 3]) < max_trans


def main():
    p = argparse.ArgumentParser(description="split generation")
    p.add_argument("--root", required=True)
    p.add_argument("--layout", choices=sorted(LAYOUTS), default="scannet")
    p.add_argument("--out", required=True)
    p.add_argument("--test-scenes", default=None,
                   help="file listing scene names to exclude")
    p.add_argument("--max-rot", type=float, default=0.5)
    p.add_argument("--max-trans", type=float, default=1.0)
    args = p.parse_args()

    lay = LAYOUTS[args.layout]
    exclude = set()
    if args.test_scenes and os.path.exists(args.test_scenes):
        with open(args.test_scenes) as f:
            exclude = {line.split("/")[0].strip() for line in f if line.strip()}

    lines = []
    dropped = 0
    for scene in sorted(os.listdir(args.root)):
        if scene in exclude:
            print(f"skip test scene {scene}")
            continue
        img_dir = os.path.join(args.root, scene, lay["image_dir"])
        pose_dir = os.path.join(args.root, scene, lay["pose_dir"])
        if not os.path.isdir(img_dir):
            continue
        frames = sorted(
            (f for f in os.listdir(img_dir) if f.endswith(lay["ext"])),
            key=lambda f: int("".join(c for c in f if c.isdigit()) or 0))
        prev_pose = None
        for fname in frames:
            pose_path = os.path.join(
                pose_dir, os.path.splitext(fname)[0] + ".txt")
            if not os.path.exists(pose_path):
                dropped += 1
                continue
            pose = np.genfromtxt(pose_path)
            if not pose_ok(pose):
                dropped += 1
                continue
            if prev_pose is not None and not motion_ok(
                    prev_pose, pose, args.max_rot, args.max_trans):
                dropped += 1
                prev_pose = pose
                continue
            prev_pose = pose
            lines.append(f"{scene}/{lay['image_dir']} {fname}")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {len(lines)} entries ({dropped} dropped) -> {args.out}")


if __name__ == "__main__":
    main()
