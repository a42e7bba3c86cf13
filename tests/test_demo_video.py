"""Annotated demo-video composition (reference `infer_video.py:700-860`)."""
import os

import numpy as np

from dro_sfm_tpu.visualization.demo_video import (
    DemoVideoComposer,
    align_to_gt,
    cloud_topdown_panel,
    draw_trajectory_panel,
    load_gt_poses,
    poses_to_obj,
)


def _circle_poses(n, radius=2.0, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    poses = []
    for i in range(n):
        a = 2 * np.pi * i / n
        T = np.eye(4)
        T[:3, 3] = [radius * np.cos(a), 0.0, radius * np.sin(a)]
        T[:3, 3] += noise * rng.normal(size=3)
        poses.append(T)
    return poses


def test_compose_canvas_and_video(tmp_path):
    import cv2
    shape = (96, 128)
    composer = DemoVideoComposer(shape, model_path="m.ckpt", data_path="d",
                                 sample_rate=2, max_frames=10, fps=5.0)
    H, W = composer.frame_size
    poses = _circle_poses(10)
    pts = np.random.default_rng(0).uniform(-1, 1, size=(500, 3))
    cols = np.random.default_rng(1).uniform(0, 1, size=(500, 3))
    frames = []
    for i in range(4):
        panels = {
            "rgb": np.random.default_rng(i).uniform(
                size=(48, 64, 3)).astype(np.float32),
            "depth": np.zeros((48, 64, 3), np.uint8),
            "traj": draw_trajectory_panel(poses, i, size=(48, 64)),
            "cloud": cloud_topdown_panel(pts, cols, size=(48, 64)),
        }
        frame = composer.compose(panels, i, f"f{i}.jpg", ate=0.123)
        assert frame.shape == (H, W, 3) and frame.dtype == np.uint8
        frames.append(frame)
    # Canvas has annotation bands (header darker than default bg).
    assert frames[0][:8].mean() < frames[0][composer.HEADER + 10].mean() + 80
    out = str(tmp_path / "demo.mp4")
    writer = cv2.VideoWriter(out, cv2.VideoWriter_fourcc(*"mp4v"), 5, (W, H))
    for f in frames:
        writer.write(f[..., ::-1])
    writer.release()
    assert os.path.getsize(out) > 1000


def test_trajectory_panel_overlay_stable_bounds():
    poses = _circle_poses(20)
    gt = np.stack([p[:3, 3] for p in _circle_poses(20, radius=2.1)])
    p_early = draw_trajectory_panel(poses, 3, size=(64, 96), overlay=gt)
    p_late = draw_trajectory_panel(poses, 18, size=(64, 96), overlay=gt)
    assert p_early.shape == p_late.shape == (64, 96, 3)
    # Later frame draws more of the path -> more non-background pixels.
    assert (p_late > 40).sum() > (p_early > 40).sum()


def test_align_to_gt_ate():
    """A similarity-transformed trajectory aligns back to ~zero ATE."""
    gt = _circle_poses(30)
    s, th = 2.5, 0.7
    R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]])
    pred = []
    for p in gt:
        T = np.eye(4)
        T[:3, 3] = s * R @ p[:3, 3] + np.array([1.0, -2.0, 3.0])
        pred.append(T)
    aligned, ate = align_to_gt(pred, gt)
    assert ate < 1e-6
    np.testing.assert_allclose(aligned,
                               np.stack([p[:3, 3] for p in gt]), atol=1e-6)
    # Noisy pred has nonzero but bounded ATE
    noisy = _circle_poses(30, noise=0.05, seed=3)
    _, ate2 = align_to_gt(noisy, gt)
    assert 0.0 < ate2 < 0.2


def test_gt_pose_loading_and_obj(tmp_path):
    pose_dir = tmp_path / "pose"
    os.makedirs(pose_dir)
    frames = []
    for i in range(5):
        T = np.eye(4)
        T[:3, 3] = [i * 0.1, 0, 0]
        np.savetxt(pose_dir / f"{i:06d}.txt", T)
        frames.append(f"/x/{i:06d}.jpg")
    poses = load_gt_poses(str(pose_dir), frames)
    assert len(poses) == 5
    np.testing.assert_allclose(poses[3][:3, 3], [0.3, 0, 0])
    # missing file -> None
    assert load_gt_poses(str(pose_dir), frames + ["/x/999.jpg"]) is None

    obj = str(tmp_path / "t.obj")
    poses_to_obj(obj, poses)
    lines = open(obj).read().splitlines()
    assert sum(ln.startswith("v ") for ln in lines) == 5
    assert any(ln.startswith("f ") for ln in lines)


def test_images_to_gif(tmp_path):
    from dro_sfm_tpu.visualization.gif import images_to_gif
    rng = np.random.default_rng(0)
    frames = [rng.uniform(size=(32, 48, 3)) for _ in range(4)]
    out = tmp_path / "seq.gif"
    n = images_to_gif(frames, str(out), fps=5,
                      labels=[f"frame {i}" for i in range(4)], scale=0.5)
    assert n == 4
    from PIL import Image
    img = Image.open(out)
    assert img.n_frames == 4 and img.size == (24, 16)

    # Directory-of-pngs input path (the reference's main mode).
    d = tmp_path / "pngs"
    d.mkdir()
    for i, f in enumerate(frames):
        Image.fromarray((f * 255).astype(np.uint8)).save(d / f"{i}.png")
    assert images_to_gif(str(d), str(tmp_path / "seq2.gif")) == 4
