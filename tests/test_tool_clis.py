"""Smoke tests for the remaining offline tool CLIs (reference tooling
parity: `debug/debug_depth.py`, `visualization/viz_datasets.py`,
`visualization/pointcloud_*.py`, `kneron/config_dataset.py`)."""
import os
import subprocess
import sys

import cv2
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(argv, timeout=600):
    env = dict(os.environ)
    env["DRO_SFM_PLATFORM"] = "cpu"
    res = subprocess.run([sys.executable] + argv, capture_output=True,
                         text=True, timeout=timeout, env=env, cwd=REPO)
    assert res.returncode == 0, res.stderr[-3000:] + res.stdout[-1000:]
    return res.stdout


def test_debug_depth_cli(tmp_path):
    png = tmp_path / "d.png"
    depth_mm = np.full((24, 32), 2500, np.uint16)
    depth_mm[0, 0] = 0
    cv2.imwrite(str(png), depth_mm)
    npz = tmp_path / "d.npz"
    np.savez(npz, depth=np.full((24, 32), 2.5, np.float32))
    out = _run([os.path.join("tools", "debug_depth.py"), str(png), str(npz)])
    assert "valid" in out and "2.500" in out


def test_preview_dataset_cli(tmp_path):
    out = tmp_path / "preview.mp4"
    _run([os.path.join("tools", "preview_dataset.py"),
          "--config", "configs/overfit_synthetic.yaml", "--split", "train",
          "--output", str(out), "--max-samples", "3"])
    assert out.stat().st_size > 0


def test_export_gt_pointcloud_cli(tmp_path):
    from tests.test_datasets import write_jpg, write_depth_png_mm
    scene = tmp_path / "scene0000_00"
    for i in range(6):
        write_jpg(str(scene / "color" / f"{i}.jpg"), seed=i)
        write_depth_png_mm(str(scene / "depth" / f"{i}.png"))
        os.makedirs(scene / "pose", exist_ok=True)
        T = np.eye(4)
        T[:3, 3] = [0.05 * i, 0, 0]
        np.savetxt(scene / "pose" / f"{i}.txt", T)
    os.makedirs(scene / "intrinsic", exist_ok=True)
    K = np.array([[100.0, 0, 32, 0], [0, 100.0, 24, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]])
    np.savetxt(scene / "intrinsic" / "intrinsic_color.txt", K)
    out = tmp_path / "scene.ply"
    _run([os.path.join("tools", "export_gt_pointcloud.py"),
          "--scene", str(scene), "--out", str(out), "--layout", "scannet",
          "--stride", "2", "--pixel-stride", "4", "--voxel", "0.1"])
    assert out.stat().st_size > 0
    header = out.read_bytes()[:200]
    assert header.startswith(b"ply")


@pytest.mark.parametrize("cam2world", [False, True])
def test_ingest_capture_gazebo_preset(tmp_path, cam2world):
    from tests.test_datasets import write_jpg, write_depth_png_mm
    cap = tmp_path / "cap"
    rows = []
    for i in range(5):
        ts = 1000.0 + i * 0.1
        write_jpg(str(cap / "cam_left" / f"{ts:.6f}.jpg"), seed=i)
        write_depth_png_mm(str(cap / "depth" / f"{ts:.6f}.png"))
        rows.append(f"{ts} {0.1 * i} 0 0 0 0 0 1\n")  # x y z qx qy qz qw
    traj = tmp_path / "traj.csv"
    traj.write_text("".join(rows))
    argv = [os.path.join("tools", "ingest_capture.py"),
            "--capture", str(cap), "--trajectory", str(traj),
            "--scene", "cap", "--split-out", str(tmp_path / "split.txt"),
            "--preset", "gazebo", "--check"]
    if cam2world:
        argv.append("--apply-cam2world")
    _run(argv)
    poses = sorted((cap / "pose").glob("*.txt"))
    assert len(poses) == 5
    T = np.loadtxt(poses[0])
    assert T.shape == (4, 4)
    if cam2world:
        # Optical-frame remap applied: rotation is the cam->gazebo axis
        # permutation, not identity.
        assert not np.allclose(T[:3, :3], np.eye(3))
        assert np.isclose(abs(np.linalg.det(T[:3, :3])), 1.0, atol=1e-6)
    else:
        np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-12)
    assert (cap / "intrinsics.txt").exists()
    assert (tmp_path / "split.txt").read_text().strip()
