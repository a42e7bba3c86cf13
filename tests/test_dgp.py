"""Self-contained DGP-format reader against a fabricated scene tree.

Covers the subset of TRI's DGP layout the reference adapter consumes
(`/root/reference/dro_sfm/datasets/dgp_dataset.py:57-273`): scene-dataset
split JSON, scene.json samples/data, quaternion calibration, temporal
context with relative poses, and lidar-projected cached depth.
"""
import json
import os

import numpy as np
import pytest

from dro_sfm_tpu.data.base import validate_sample
from tests.test_datasets import write_jpg

H, W = 48, 64
FX = FY = 100.0
CX, CY = (W - 1) / 2, (H - 1) / 2
CAM, LIDAR = "camera_01", "lidar"


def _pose_json(tx=0.0, ty=0.0, tz=0.0, qw=1.0, qx=0.0, qy=0.0, qz=0.0):
    return {"translation": {"x": tx, "y": ty, "z": tz},
            "rotation": {"qw": qw, "qx": qx, "qy": qy, "qz": qz}}


@pytest.fixture
def dgp_tree(tmp_path):
    """One scene, 4 samples, camera moving +0.5 m in x per frame, plus a
    static lidar point grid 4 m in front of the first camera pose."""
    root = tmp_path / "ddad"
    scene_dir = root / "scene_000"
    n = 4
    data, samples = [], []
    # A plane of lidar points at world z=4 covering the camera frustum.
    ys, xs = np.mgrid[-1.0:1.0:12j, -2.0:3.0:24j]
    points = np.stack([xs.ravel(), ys.ravel(), np.full(xs.size, 4.0)],
                      axis=-1)
    points = np.concatenate([points, [[0.0, 0.0, 4.0]]])  # principal ray
    os.makedirs(scene_dir / "point_cloud" / LIDAR, exist_ok=True)
    for t in range(n):
        ts = f"{t:016d}"
        img_file = f"rgb/{CAM}/{ts}.jpg"
        write_jpg(str(scene_dir / img_file), h=H, w=W, seed=t)
        data.append({
            "key": f"img{t}",
            "id": {"name": CAM, "timestamp": ts},
            "datum": {"image": {"filename": img_file,
                                "pose": _pose_json(tx=0.5 * t)}},
        })
        pc_file = f"point_cloud/{LIDAR}/{ts}.npz"
        np.savez(scene_dir / pc_file, data=points)
        data.append({
            "key": f"pc{t}",
            "id": {"name": LIDAR, "timestamp": ts},
            "datum": {"point_cloud": {"filename": pc_file,
                                      "pose": _pose_json()}},
        })
        samples.append({"id": {"timestamp": ts},
                        "datum_keys": [f"img{t}", f"pc{t}"],
                        "calibration_key": "calib0"})
    os.makedirs(scene_dir / "calibration", exist_ok=True)
    with open(scene_dir / "calibration" / "calib0.json", "w") as f:
        json.dump({"names": [CAM, LIDAR],
                   "intrinsics": [
                       {"fx": FX, "fy": FY, "cx": CX, "cy": CY},
                       {}],
                   "extrinsics": [_pose_json(), _pose_json()]}, f)
    with open(scene_dir / "scene.json", "w") as f:
        json.dump({"name": "scene_000", "samples": samples, "data": data}, f)
    with open(root / "scene_dataset_v1.0.json", "w") as f:
        json.dump({"scene_splits": {
            "0": {"filenames": ["scene_000/scene.json"]},
            "2": {"filenames": ["scene_000/scene.json"]}}}, f)
    return str(root)


def test_dgp_dataset_schema_and_poses(dgp_tree):
    from dro_sfm_tpu.data.dgp import DGPDataset
    ds = DGPDataset(dgp_tree, split="train", mode="validation",
                    cameras=[CAM], depth_type=LIDAR,
                    back_context=1, forward_context=1)
    assert len(ds) == 2  # 4 samples, 1 back + 1 forward context
    s = ds[0]  # target t=1
    validate_sample(s)
    assert s["rgb"].shape == (H, W, 3)
    assert s["rgb_context"].shape == (2, H, W, 3)
    # Camera moves +0.5 x per frame; T_{ctx<-target} translates by the
    # *negative* relative camera motion in the ctx frame.
    np.testing.assert_allclose(s["pose_context"][0][:3, 3], [0.5, 0, 0],
                               atol=1e-6)  # back ctx t=0
    np.testing.assert_allclose(s["pose_context"][1][:3, 3], [-0.5, 0, 0],
                               atol=1e-6)  # fwd ctx t=2


def test_dgp_depth_projection_and_cache(dgp_tree):
    from dro_sfm_tpu.data.dgp import DGPDataset
    ds = DGPDataset(dgp_tree, split="train", mode="validation",
                    cameras=[CAM], depth_type=LIDAR,
                    back_context=0, forward_context=1)
    s = ds[0]  # target t=0: camera at origin, points at z=4
    depth = s["depth"][..., 0]
    hit = depth > 0
    assert hit.any()
    np.testing.assert_allclose(depth[hit], 4.0, atol=1e-5)
    # The world point (0, 0, 4) projects to the principal point.
    assert depth[int(round(CY)), int(round(CX))] == pytest.approx(4.0)
    # Cached npz written and reused.
    cache = os.path.join(dgp_tree, "scene_000", "depth", LIDAR, CAM,
                         f"{0:016d}.npz")
    assert os.path.exists(cache)
    marker = np.full((H, W), 7.0, dtype=np.float32)
    np.savez_compressed(cache, depth=marker)
    s2 = ds[0]
    np.testing.assert_allclose(s2["depth"][..., 0], 7.0)


def test_dgp_via_registry(dgp_tree):
    """End-to-end through setup_dataset with the config section plumbing."""
    from dro_sfm_tpu.data import setup_dataset
    from dro_sfm_tpu.utils.config import load_config, prepare_config

    cfg = load_config()
    sec = cfg.datasets.test
    sec.dataset = ["DGP"]
    sec.path = [dgp_tree]
    sec.split = ["test"]
    sec.depth_type = [LIDAR]
    sec.cameras = [[CAM]]
    sec.forward_context = 1
    cfg.datasets.augmentation.image_shape = (H, W)
    cfg = prepare_config(cfg)
    ds = setup_dataset(sec, cfg.datasets.augmentation, "test")[0]
    assert len(ds) == 3  # forward_context=1 only
    validate_sample(ds[1])


def test_dgp_train_mode_resize(dgp_tree):
    from dro_sfm_tpu.data.dgp import DGPDataset
    ds = DGPDataset(dgp_tree, split="train", mode="train", cameras=[CAM],
                    depth_type=None, back_context=1, forward_context=1,
                    image_shape=(32, 48), jittering=(0.2, 0.2, 0.2, 0.05))
    s = ds[0]
    assert s["rgb"].shape == (32, 48, 3)
    assert "rgb_original" in s
    # Intrinsics rescaled with the resize.
    assert s["intrinsics"][0, 0] == pytest.approx(FX * 48 / W)
