"""End-to-end drive of the infer_video CLI (reference `scripts/
infer_video.py` SfM demo) on a tiny network + fabricated frames.

Locks the streaming output layout: depths land in a memmapped depths.npy,
panel snapshots spill to <output>/panels/, and the GT-pose mode draws the
sim3-aligned prediction and prints an ATE.
"""
import os
import subprocess
import sys

import cv2
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
H, W = 48, 64


@pytest.fixture
def tiny_checkpoint(tmp_path):
    import jax
    from dro_sfm_tpu.models import DepthPoseNet
    from dro_sfm_tpu.training.checkpoint import save_checkpoint
    from dro_sfm_tpu.utils.config import load_config

    cfg = load_config(overrides={
        "model": {"depth_net": {"version": "it4-h-out-seq2"},
                  "params": {"min_depth": 0.2, "max_depth": 20.0}},
        "datasets": {"augmentation": {"image_shape": (H, W)}},
    })
    net = DepthPoseNet(version="it4-h-out-seq2", min_depth=0.2,
                       max_depth=20.0)
    rng = np.random.default_rng(0)
    import jax.numpy as jnp
    K = jnp.asarray([[W * 0.8, 0, (W - 1) / 2], [0, W * 0.8, (H - 1) / 2],
                     [0, 0, 1.0]], jnp.float32)
    variables = jax.jit(lambda r: net.init(
        r, jnp.zeros((1, H, W, 3), jnp.float32),
        jnp.zeros((1, 2, H, W, 3), jnp.float32),
        K[None], train=False))(jax.random.PRNGKey(0))

    class S:
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = ()
        step = 0

    path = str(tmp_path / "tiny.ckpt")
    save_checkpoint(path, S(), epoch=0, config=cfg.to_dict())
    return path


@pytest.mark.slow
def test_infer_video_cli_streams_outputs(tmp_path, tiny_checkpoint):
    frames = tmp_path / "frames"
    gt = tmp_path / "gt"
    out = tmp_path / "out"
    frames.mkdir()
    gt.mkdir()
    rng = np.random.default_rng(1)
    for i in range(5):
        img = (rng.uniform(0, 255, (H, W, 3))).astype(np.uint8)
        cv2.imwrite(str(frames / f"f{i:04d}.jpg"), img)
        T = np.eye(4)
        T[:3, 3] = [0.1 * i, 0.0, 0.02 * i]
        np.savetxt(gt / f"f{i:04d}.txt", T)

    env = dict(os.environ)
    # The axon sitecustomize ignores JAX_PLATFORMS; the CLIs honor this.
    env["DRO_SFM_PLATFORM"] = "cpu"
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "infer_video.py"),
         "--checkpoint", tiny_checkpoint, "--input", str(frames),
         "--output", str(out), "--gt-poses", str(gt),
         "--image-shape", str(H), str(W)],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "ATE-RMSE" in res.stdout

    depths = np.load(out / "depths.npy")
    assert depths.shape[0] == 3 and np.isfinite(depths).all()
    assert (out / "depth_vis.mp4").stat().st_size > 0
    assert (out / "trajectory.json").exists()
    assert (out / "pointcloud.ply").exists()
    panels = os.listdir(out / "panels")
    # rgb/depth/mask spilled per middle frame.
    assert sum(p.startswith("rgb_") for p in panels) == 3
    assert sum(p.startswith("depth_") for p in panels) == 3
