"""Depth/pose quality filters and the capture ingestion pipeline
(reference `datasets/depth_filter.py`, `matterport_filter.py`,
`kneron/config_dataset.py`)."""
import os
import subprocess
import sys

import cv2
import numpy as np
import pytest

from dro_sfm_tpu.data.depth_filter import (
    THRESHOLD_1, THRESHOLD_5, clip_depth, filter_sequence,
    find_idx_of_prev_n, invalid_depth_fraction, is_invalid_pose,
    matrix_to_6d_pose, pose_in_threshold_1, split_lines_from_segments)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_clip_depth_range():
    d = np.array([[0, 300, 400, 5000, 10000, 10001]], dtype=np.int64)
    out = clip_depth(d)
    assert out.tolist() == [[0, 0, 400, 5000, 10000, 0]]
    assert d[0, 1] == 300  # input untouched


def test_invalid_pose_detection():
    assert not is_invalid_pose(np.eye(4))
    bad = np.eye(4)
    bad[1, 2] = np.nan
    assert is_invalid_pose(bad)
    bad[1, 2] = np.inf
    assert is_invalid_pose(bad)


def test_matrix_to_6d_pose_translation_mm_and_rot_deg():
    a = np.eye(4)
    b = np.eye(4)
    b[:3, 3] = [0.05, 0.0, 0.02]  # metres
    p = matrix_to_6d_pose(b, a)
    np.testing.assert_allclose(p[:3], [50.0, 0.0, 20.0], atol=1e-9)
    np.testing.assert_allclose(p[3:], 0.0, atol=1e-9)

    c = np.eye(4)
    ang = np.radians(4.0)
    c[:3, :3] = np.array([[np.cos(ang), -np.sin(ang), 0],
                          [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    p = matrix_to_6d_pose(c, a)
    assert abs(abs(p[5]) - 4.0) < 1e-6


def test_thresholds_nested():
    # Threshold-5 is strictly looser than threshold-1.
    p_small = [50, 10, 10, 2, 1, 1]
    p_mid = [120, 0, 0, 10, 0, 0]
    p_big = [500, 0, 0, 30, 0, 0]
    assert pose_in_threshold_1(p_small) and THRESHOLD_5.contains(p_small)
    assert not pose_in_threshold_1(p_mid) and THRESHOLD_5.contains(p_mid)
    assert not THRESHOLD_5.contains(p_big)
    # Norm limit rejects even when per-axis limits pass.
    p_norm = [85, 85, 0, 0, 0, 0]  # axes < 90 but norm 120.2 > 120
    assert not THRESHOLD_1.contains(p_norm)


def test_find_idx_of_prev_n():
    dropped = [False, True, False, True, False]
    assert find_idx_of_prev_n(dropped, 4, 1) == 2
    assert find_idx_of_prev_n(dropped, 4, 2) == 0
    assert find_idx_of_prev_n(dropped, 4, 3) == -1


def test_filter_sequence_drop_and_split():
    def pose_at(x_m):
        T = np.eye(4)
        T[0, 3] = x_m
        return T

    # 0.05 m steps are inside threshold-1 (50mm < 90); a 1 m jump splits.
    poses = [pose_at(0.0), pose_at(0.05), pose_at(0.10), pose_at(1.10),
             pose_at(1.15), pose_at(1.20), pose_at(1.25)]
    fracs = [0.0] * len(poses)
    fracs[2] = 0.9  # mostly-invalid depth -> dropped
    bad = np.full((4, 4), np.nan)
    poses.append(bad)
    fracs.append(0.0)
    keep, seg = filter_sequence(poses, fracs)
    assert keep.tolist() == [True, True, False, True, True, True, True, False]
    assert seg[0] == seg[1] == 0
    assert seg[2] == -1 and seg[7] == -1
    # After the dropped frame the 1.0m jump vs frame 1 opens segment 1.
    assert seg[3] == seg[4] == seg[5] == seg[6] == 1

    names = [f"{i:06d}.jpg" for i in range(len(poses))]
    lines = split_lines_from_segments(names, keep, seg, "cap/cam_left",
                                      min_segment=3)
    # Segment 0 (2 frames) is below min_segment; segment 1 (4 frames) kept.
    assert lines == [f"cap/cam_left {i:06d}.jpg" for i in (3, 4, 5, 6)]


def test_invalid_depth_fraction():
    d = np.full((10, 10), 2000, np.uint16)
    d[:4] = 0  # 40 rows... 4 rows of 10 = 40 px invalid
    assert invalid_depth_fraction(d) == pytest.approx(0.4)


def _write_capture(tmp_path, n=8, jump_at=5):
    cap = tmp_path / "cap01"
    os.makedirs(cap / "cam_left")
    os.makedirs(cap / "depth")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        ts = 1000.0 + i * 0.1
        name = f"{ts:.1f}"
        img = rng.integers(0, 255, size=(48, 64, 3)).astype(np.uint8)
        cv2.imwrite(str(cap / "cam_left" / (name + ".jpg")), img)
        depth = np.full((48, 64), 2000, np.uint16)
        if i == 2:
            depth[:] = 0  # fully invalid depth -> dropped by --filter
        cv2.imwrite(str(cap / "depth" / (name + ".png")), depth)
        x = 0.05 * i + (1.0 if i >= jump_at else 0.0)
        rows.append(f"{ts},{x},0,0,0,0,0,1")
    traj = cap / "traj.csv"
    traj.write_text("\n".join(rows) + "\n")
    return cap, traj


def test_ingest_capture_filter_and_preview(tmp_path):
    cap, traj = _write_capture(tmp_path)
    split = tmp_path / "split.txt"
    video = tmp_path / "preview.mp4"
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "ingest_capture.py"),
         "--capture", str(cap), "--trajectory", str(traj),
         "--scene", "cap01", "--split-out", str(split),
         "--check", "--filter", "--min-segment", "2",
         "--preview-video", str(video)],
        capture_output=True, text=True, env={**os.environ,
                                             "JAX_PLATFORMS": "cpu"})
    assert res.returncode == 0, res.stdout + res.stderr
    lines = split.read_text().split()
    # 8 matched frames, frame idx 2 dropped (invalid depth), split at the
    # 1m jump -> two segments of >=2 frames each: 7 lines * 2 tokens.
    assert "check missing_depth: 0" in res.stdout
    body = split.read_text().strip().splitlines()
    assert len(body) == 7
    assert all(line.startswith("cap01/cam_left ") for line in body)
    assert os.path.exists(video) and os.path.getsize(video) > 0
    # pose txts written
    assert len(os.listdir(cap / "pose")) == 8


def test_ingest_capture_gazebo_preset(tmp_path):
    cap, traj = _write_capture(tmp_path, n=3, jump_at=99)
    split = tmp_path / "split.txt"
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "ingest_capture.py"),
         "--capture", str(cap), "--trajectory", str(traj),
         "--scene", "cap01", "--split-out", str(split),
         "--preset", "gazebo"],
        capture_output=True, text=True, env={**os.environ,
                                             "JAX_PLATFORMS": "cpu"})
    assert res.returncode == 0, res.stdout + res.stderr
    K = np.genfromtxt(cap / "intrinsics.txt")
    assert abs(K[0, 0] - 530.4669406576809) < 1e-9
    # Identity-rotation trajectory -> camera pose translated by the
    # cam->GT chain ([-0.076, 0, -0.093] total).
    T0 = np.genfromtxt(cap / "pose" / os.listdir(cap / "pose")[0])
    np.testing.assert_allclose(T0[:3, :3], np.eye(3), atol=1e-12)
    assert abs(T0[1, 3]) < 1e-9 and abs((T0[2, 3]) - (-0.093)) < 1e-9
