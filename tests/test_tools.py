"""Offline tooling: pose stats, voxel downsample, GT cloud fusion, splits."""
import os
import subprocess
import sys

import cv2
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_scene(tmp_path, n=12, with_bad=True):
    """Scannet-layout scene with synthetic depth/pose/intrinsics."""
    scene = tmp_path / "scans" / "scene0000_00"
    rng = np.random.default_rng(0)
    for i in range(n):
        os.makedirs(scene / "color", exist_ok=True)
        os.makedirs(scene / "depth", exist_ok=True)
        os.makedirs(scene / "pose", exist_ok=True)
        img = rng.integers(0, 255, size=(48, 64, 3)).astype(np.uint8)
        cv2.imwrite(str(scene / "color" / f"{i}.jpg"), img)
        depth = np.full((48, 64), 2000, np.uint16)
        depth[:4] = 0
        cv2.imwrite(str(scene / "depth" / f"{i}.png"), depth)
        T = np.eye(4)
        T[:3, 3] = [0.1 * i, 0.0, 0.0]
        np.savetxt(scene / "pose" / f"{i}.txt", T)
    if with_bad:
        np.savetxt(scene / "pose" / f"{n}.txt", np.full((4, 4), np.nan))
    os.makedirs(scene / "intrinsic", exist_ok=True)
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 60.0
    K[0, 2], K[1, 2] = 32, 24
    np.savetxt(scene / "intrinsic" / "intrinsic_color.txt", K)
    return scene


def test_pose_stats(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from pose_stats import rotation_defect, sequence_stats
    scene = _make_scene(tmp_path)
    stats = sequence_stats(str(scene))
    assert stats["n_valid"] == 12
    assert stats["n_nan"] == 1
    assert stats["n_bad_rotation"] == 0
    assert abs(stats["move_m"]["mean"] - 0.1) < 1e-6
    assert abs(stats["move_m"]["total"] - 1.1) < 1e-6
    bad_R = np.eye(3) * 2.0
    assert rotation_defect(bad_R) > 1.0


def test_voxel_downsample():
    from dro_sfm_tpu.visualization.pointcloud import voxel_downsample
    rng = np.random.default_rng(0)
    # two clusters far apart -> two voxels at coarse size
    pts = np.concatenate([rng.normal(0.5, 0.005, size=(50, 3)),
                          rng.normal(5.5, 0.005, size=(50, 3))])
    cols = np.concatenate([np.zeros((50, 3), np.uint8),
                           np.full((50, 3), 200, np.uint8)])
    out, oc = voxel_downsample(pts, cols, voxel=1.0)
    assert out.shape[0] == 2
    # means land near the cluster centers, colors averaged per voxel
    centers = sorted(out[:, 0].tolist())
    assert abs(centers[0] - 0.5) < 0.1 and abs(centers[1] - 5.5) < 0.1
    assert set(np.unique(oc)) <= {0, 200}


def test_fuse_scene_pointcloud(tmp_path):
    from dro_sfm_tpu.visualization.pointcloud import fuse_scene_pointcloud
    scene = _make_scene(tmp_path)
    out = str(tmp_path / "cloud.ply")
    n = fuse_scene_pointcloud(str(scene), out, stride=3, pixel_stride=4,
                              voxel=0.0)
    assert n > 0
    header = open(out).read(200)
    assert "element vertex" in header
    # voxel downsampling reduces the count
    out2 = str(tmp_path / "cloud2.ply")
    n2 = fuse_scene_pointcloud(str(scene), out2, stride=3, pixel_stride=4,
                               voxel=0.5)
    assert 0 < n2 < n


def test_generate_splits_partition_and_vis(tmp_path):
    scene = _make_scene(tmp_path, n=12, with_bad=False)
    root = os.path.dirname(str(scene))
    out = str(tmp_path / "splits" / "list.txt")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "generate_splits.py"),
         "--root", root, "--layout", "scannet", "--out", out,
         "--val-tail", "3", "--test-tail", "2", "--depth-vis", "--traj-obj"],
        capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0, r.stderr
    train = open(out).read().split()
    val = open(out + ".val").read().splitlines()
    test = open(out + ".test").read().splitlines()
    assert len(val) == 3 and len(test) == 2
    # tail holdout: last frames go to test
    assert test[-1].endswith("11.jpg")
    assert os.path.isdir(os.path.join(root, "scene0000_00", "depth_vis"))
    assert os.path.exists(os.path.join(root, "scene0000_00",
                                       "camera_trajectory_w.obj"))
    assert len(train) > 0
