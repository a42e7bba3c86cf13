"""One-command model-zoo pipeline: reference .ckpt -> converted eval ->
README side-by-side (`tools/eval_reference_ckpt.py`).

Fabricates a reference-format checkpoint (actual upstream model via the
torchvision shim, yacs-layout embedded config) plus a minimal ScanNet tree
and runs the whole pipeline as a subprocess — the exact command a user with
real data and the published checkpoints would run
(`/root/reference/README.md:163-183`).
"""
import json
import os
import subprocess
import sys

import cv2
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
H, W = 48, 64
VERSION = "it4-h-out-seq2"


def _write_scene(root):
    scene = "scene0000_00"
    os.makedirs(root / scene / "pose", exist_ok=True)
    os.makedirs(root / scene / "intrinsic", exist_ok=True)
    rng = np.random.default_rng(0)
    names = []
    for i in range(12):
        name = f"{i}.jpg"
        names.append(name)
        img_path = root / scene / "color" / name
        os.makedirs(img_path.parent, exist_ok=True)
        cv2.imwrite(str(img_path),
                    rng.uniform(0, 255, (H, W, 3)).astype(np.uint8))
        dep_path = root / scene / "depth" / f"{i}.png"
        os.makedirs(dep_path.parent, exist_ok=True)
        cv2.imwrite(str(dep_path),
                    np.full((H, W), 2500, np.uint16))
        pose = np.eye(4)
        pose[:3, 3] = [0.05 * i, 0, 0]
        np.savetxt(root / scene / "pose" / f"{i}.txt", pose)
    K = np.array([[60.0, 0, W / 2, 0], [0, 60.0, H / 2, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]])
    np.savetxt(root / scene / "intrinsic" / "intrinsic_color.txt", K)
    with open(root.parent / "split.txt", "w") as f:
        for name in names:
            f.write(f"{scene}/color {name}\n")


@pytest.mark.slow
def test_eval_reference_ckpt_pipeline(tmp_path):
    torch = pytest.importorskip("torch")
    from tests.reference_shim import load_reference_depth_pose_net

    tnet = load_reference_depth_pose_net(VERSION, min_depth=0.2,
                                         max_depth=20.0)
    ref_ckpt = str(tmp_path / "indoor_scannet.ckpt")
    torch.save({
        "state_dict": {f"model.depth_net.{k}": v
                       for k, v in tnet.state_dict().items()
                       if "num_batches_tracked" not in k},
        "epoch": 3,
        "config": {
            "model": {"name": "SupModelMF",
                      "depth_net": {"name": "DepthPoseNet",
                                    "version": VERSION},
                      "params": {"min_depth": 0.2, "max_depth": 20.0,
                                 "crop": ""}},
            "datasets": {"augmentation": {"image_shape": [H, W]}},
        },
    }, ref_ckpt)

    root = tmp_path / "scans"
    _write_scene(root)

    env = dict(os.environ)
    env["DRO_SFM_PLATFORM"] = "cpu"
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "eval_reference_ckpt.py"),
         ref_ckpt, "--dataset", "Scannet", "--path", str(root),
         "--split", "split.txt", "--batch-size", "1"],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert res.returncode == 0, res.stderr[-4000:]

    # Converted checkpoint written alongside the input.
    assert os.path.exists(str(tmp_path / "indoor_scannet.converted.ckpt"))

    # Last stdout line is the machine-readable result.
    payload = json.loads(res.stdout.strip().splitlines()[-1])
    assert payload["readme_row"]["abs_rel"] == 0.053  # keyed by filename
    for key in ("abs_rel_pp_gt", "rmse_pp_gt", "a1_pp_gt"):
        assert np.isfinite(payload["metrics"][key])
    # Delta vs README computed for every reported metric of the row.
    assert "abs_rel" in payload["delta"]
    assert "rot_ang" in payload["delta"]
    # Random weights are nowhere near the zoo numbers — but the comparison
    # plumbing must still subtract correctly.
    assert abs(payload["delta"]["abs_rel"]
               - (payload["metrics"]["abs_rel_pp_gt"] - 0.053)) < 1e-9
    # Human-readable table shows the README row.
    assert "README" in res.stdout
