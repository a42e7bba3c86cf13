"""Dataset readers against synthesized on-disk fixtures.

The reference datasets need real downloads; these tests fabricate minimal
directory trees matching each format (SURVEY.md §2.7) and check the readers
produce the shared sample schema with correct geometry conventions.
"""
import os

import cv2
import numpy as np
import pytest

from dro_sfm_tpu.data.base import validate_sample


def write_jpg(path, h=48, w=64, seed=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    img = (rng.uniform(0, 255, size=(h, w, 3))).astype(np.uint8)
    cv2.imwrite(path, img)


def write_depth_png_mm(path, h=48, w=64, value_m=2.5):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    depth = np.full((h, w), value_m * 1000.0, dtype=np.uint16)
    depth[0, 0] = 0  # invalid pixel
    cv2.imwrite(path, depth)


# ---------------------------------------------------------------------------
# ScanNet
# ---------------------------------------------------------------------------

@pytest.fixture
def scannet_tree(tmp_path):
    root = tmp_path / "scans"
    scene = "scene0000_00"
    n = 12
    for i in range(n):
        write_jpg(str(root / scene / "color" / f"{i}.jpg"), seed=i)
        write_depth_png_mm(str(root / scene / "depth" / f"{i}.png"))
        pose = np.eye(4)
        pose[:3, 3] = [0.1 * i, 0.0, 0.0]
        os.makedirs(root / scene / "pose", exist_ok=True)
        np.savetxt(root / scene / "pose" / f"{i}.txt", pose)
    os.makedirs(root / scene / "intrinsic", exist_ok=True)
    K = np.array([[100.0, 0, 32, 0], [0, 100.0, 24, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]])
    np.savetxt(root / scene / "intrinsic" / "intrinsic_color.txt", K)
    split = tmp_path / "train_split.txt"
    with open(split, "w") as f:
        for i in range(n):
            f.write(f"{scene}/color {i}.jpg\n")
    return str(root), "train_split.txt"


def test_scannet_dataset(scannet_tree):
    from dro_sfm_tpu.data.scannet import ScannetDataset
    root, split = scannet_tree
    ds = ScannetDataset(root, split, mode="validation",
                        back_context=1, forward_context=1, downsample=1)
    assert len(ds) == 10  # 12 frames minus 2 border frames
    s = ds[0]
    validate_sample(s)
    assert s["rgb_context"].shape[0] == 2
    # Relative pose: target frame 1, back ctx frame 0 (+0.1x apart):
    # T_{ctx<-target} = inv(pose0) @ pose1 -> translation +0.1 in x.
    np.testing.assert_allclose(
        s["pose_context"][0][:3, 3], [0.1, 0, 0], atol=1e-6)
    # mm -> m depth with invalid -> -1
    assert abs(float(np.max(s["depth"])) - 2.5) < 1e-5
    assert float(np.min(s["depth"])) == -1.0


def test_scannet_train_transform(scannet_tree):
    from dro_sfm_tpu.data.scannet import ScannetDataset
    root, split = scannet_tree
    ds = ScannetDataset(root, split, mode="train", back_context=1,
                        forward_context=1, downsample=1,
                        image_shape=(32, 48), jittering=(0.2, 0.2, 0.2, 0.05))
    s = ds[0]
    assert s["rgb"].shape == (32, 48, 3)
    assert "rgb_original" in s and s["rgb_original"].shape == (32, 48, 3)
    # depth resized with the sample for training
    assert s["depth"].shape == (32, 48, 1)
    # intrinsics rescaled by the plain multiply convention
    np.testing.assert_allclose(s["intrinsics"][0, 0], 100.0 * 48 / 64)


# ---------------------------------------------------------------------------
# DeMoN
# ---------------------------------------------------------------------------

@pytest.fixture
def demon_tree(tmp_path):
    root = tmp_path / "demon"
    for name in ("sun3d_0001", "sun3d_0002"):
        d = root / name
        write_jpg(str(d / "0000.jpg"))
        write_jpg(str(d / "0001.jpg"), seed=1)
        np.save(str(d / "0000.npy"),
                np.full((48, 64), 3.0, dtype=np.float32))
        poses = np.zeros((2, 12))
        poses[0] = np.eye(4)[:3].reshape(-1)
        p1 = np.eye(4)
        p1[:3, 3] = [0.5, 0, 0]
        poses[1] = p1[:3].reshape(-1)
        np.savetxt(str(d / "poses.txt"), poses)
        np.savetxt(str(d / "cam.txt"),
                   np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]]))
    with open(root / "train.txt", "w") as f:
        f.write("sun3d_0001\nsun3d_0002\n")
    return str(root)


def test_demon_dataset(demon_tree):
    from dro_sfm_tpu.data.demon import DemonDataset
    ds = DemonDataset(demon_tree, "train.txt", mode="validation")
    assert len(ds) == 2
    s = ds[0]
    validate_sample(s)
    assert s["rgb_context"].shape == (1, 48, 64, 3)
    # rel pose = pose1 @ inv(pose0) = translation +0.5 in x
    np.testing.assert_allclose(
        s["pose_context"][0][:3, 3], [0.5, 0, 0], atol=1e-6)
    assert abs(float(s["depth"].max()) - 3.0) < 1e-6


# ---------------------------------------------------------------------------
# Video / Image folders
# ---------------------------------------------------------------------------

def test_video_dataset(tmp_path):
    from dro_sfm_tpu.data.video import VideoDataset
    root = tmp_path / "vid"
    for i in range(8):
        write_jpg(str(root / "seq0" / f"{i:06d}.jpg"), seed=i)
    ds = VideoDataset(str(root), mode="validation",
                      back_context=1, forward_context=1)
    assert len(ds) == 6
    s = ds[0]
    validate_sample(s)
    # dummy intrinsics convention fx = 1.2 * W
    np.testing.assert_allclose(s["intrinsics"][0, 0], 1.2 * 64)


# ---------------------------------------------------------------------------
# Matterport
# ---------------------------------------------------------------------------

@pytest.fixture
def matterport_tree(tmp_path):
    root = tmp_path / "matterport"
    scene = "sceneA/cam_left"
    for i in range(8):
        write_jpg(str(root / scene / f"{i:013d}.jpg"), seed=i)
        write_depth_png_mm(
            str(root / "sceneA" / "depth" / f"{i:013d}.png"), value_m=1.5)
        pose = np.eye(4)
        pose[:3, 3] = [0.0, 0.05 * i, 0.0]
        os.makedirs(root / "sceneA" / "pose", exist_ok=True)
        np.savetxt(root / "sceneA" / "pose" / f"{i:013d}.txt", pose)
    with open(root / "split.txt", "w") as f:
        for i in range(8):
            f.write(f"{scene} {i:013d}.jpg\n")
    return str(root)


def test_matterport_dataset(matterport_tree):
    from dro_sfm_tpu.data.matterport import MatterportDataset
    ds = MatterportDataset(matterport_tree, "split.txt", mode="validation",
                           back_context=1, forward_context=1,
                           downsample=1, adaptive=False)
    assert len(ds) == 6
    s = ds[0]
    validate_sample(s)
    np.testing.assert_allclose(
        s["pose_context"][0][:3, 3], [0.0, 0.05, 0.0], atol=1e-6)
    assert abs(float(s["depth"].max()) - 1.5) < 1e-5


# ---------------------------------------------------------------------------
# KITTI (velodyne npz depth + oxts pose chain)
# ---------------------------------------------------------------------------

def build_kitti_tree(tmp_path):
    """Minimal KITTI-layout tree (also used by the train-CLI overfit
    test)."""
    root = tmp_path / "kitti"
    date = "2011_09_26"
    drive = f"{date}/{date}_drive_0001_sync"
    img_dir = root / drive / "image_02" / "data"
    oxts_dir = root / drive / "oxts" / "data"
    depth_dir = root / drive / "proj_depth" / "velodyne" / "image_02"
    for i in range(6):
        write_jpg(str(img_dir / f"{i:010d}.png"), seed=i)
        os.makedirs(oxts_dir, exist_ok=True)
        # lat lon alt roll pitch yaw + padding to 30 fields
        vals = [49.0 + i * 1e-6, 8.43, 110.0, 0.0, 0.0, 0.1 * i] + [0.0] * 24
        np.savetxt(str(oxts_dir / f"{i:010d}.txt"),
                   np.array(vals)[None], fmt="%.8f")
        os.makedirs(depth_dir, exist_ok=True)
        np.savez_compressed(str(depth_dir / f"{i:010d}.npz"),
                            velodyne_depth=np.full((48, 64), 7.0,
                                                   dtype=np.float32))
    # Calibration files
    K = "7.0 0.0 32.0 0.0  0.0 7.0 24.0 0.0  0.0 0.0 1.0 0.0"
    with open(root / date / "calib_cam_to_cam.txt", "w") as f:
        f.write(f"P_rect_02: {K}\n")
        f.write("R_rect_00: 1 0 0 0 1 0 0 0 1\n")
    with open(root / date / "calib_velo_to_cam.txt", "w") as f:
        f.write("R: 1 0 0 0 1 0 0 0 1\nT: 0 0 0\n")
    with open(root / date / "calib_imu_to_velo.txt", "w") as f:
        f.write("R: 1 0 0 0 1 0 0 0 1\nT: 0 0 0\n")
    split = root / "split.txt"
    with open(split, "w") as f:
        for i in range(1, 5):
            f.write(f"{drive}/image_02/data/{i:010d}.png\n")
    return str(root)


@pytest.fixture
def kitti_tree(tmp_path):
    return build_kitti_tree(tmp_path)


def test_kitti_dataset(kitti_tree):
    from dro_sfm_tpu.data.kitti import KITTIDataset
    ds = KITTIDataset(kitti_tree, "split.txt", mode="validation",
                      depth_type="velodyne", with_pose=True,
                      back_context=1, forward_context=1)
    assert len(ds) == 4
    s = ds[0]
    validate_sample(s)
    assert s["rgb_context"].shape[0] == 2
    np.testing.assert_allclose(s["intrinsics"][0, 0], 7.0)
    assert abs(float(s["depth"].max()) - 7.0) < 1e-6
    # Pose chain: finite, context poses are relative transforms whose
    # rotation reflects the yaw difference between frames (0.1 rad).
    rel = s["pose_context"][1]  # forward context
    assert np.all(np.isfinite(rel))
    yaw = np.arctan2(rel[0, 2], rel[0, 0])
    assert abs(abs(yaw)) < 0.5  # small rotation, right order of magnitude


# ---------------------------------------------------------------------------
# NYU (processed h5 dumps)
# ---------------------------------------------------------------------------

@pytest.fixture
def nyu_tree(tmp_path):
    import h5py
    root = tmp_path / "nyu"
    for sess in ("bathroom_0001", "bedroom_0002"):
        d = root / sess
        os.makedirs(d, exist_ok=True)
        for i in range(4):
            rng = np.random.default_rng(i)
            with h5py.File(d / f"{i:05d}.h5", "w") as f:
                f["rgb"] = rng.integers(
                    0, 255, size=(3, 48, 64)).astype(np.uint8)
                f["depth"] = np.full((48, 64), 2.0 + i, dtype=np.float32)
    return str(root)


def test_nyu_dataset(nyu_tree):
    from dro_sfm_tpu.data.nyu import NYU_K, NYUDataset
    ds = NYUDataset(nyu_tree, mode="validation",
                    back_context=1, forward_context=1)
    assert len(ds) == 4  # (4 - 2 border) per session x 2 sessions
    s = ds[0]
    validate_sample(s)
    assert s["rgb_context"].shape == (2, 48, 64, 3)
    np.testing.assert_allclose(s["intrinsics"], NYU_K)
    # target of the first sample is frame 1 of the session -> depth 3.0
    assert abs(float(s["depth"].max()) - 3.0) < 1e-6


def test_nyu_train_mode_resize(nyu_tree):
    from dro_sfm_tpu.data.nyu import NYUDataset
    ds = NYUDataset(nyu_tree, mode="train", back_context=1,
                    forward_context=0, image_shape=(32, 48),
                    jittering=(0.2, 0.2, 0.2, 0.05))
    s = ds[0]
    assert s["rgb"].shape == (32, 48, 3)
    assert s["rgb_context"].shape == (1, 32, 48, 3)
    assert s["depth"].shape == (32, 48, 1)


# ---------------------------------------------------------------------------
# DemonMF (2-/3-view folders, middle-frame target)
# ---------------------------------------------------------------------------

@pytest.fixture
def demon_mf_tree(tmp_path):
    root = tmp_path / "demon_mf"
    # 3-view folder
    d3 = root / "sun3d_three"
    for i in range(3):
        write_jpg(str(d3 / f"{i:04d}.jpg"), seed=i)
        np.save(str(d3 / f"{i:04d}.npy"),
                np.full((48, 64), 2.0 + i, dtype=np.float32))
    poses = []
    for i in range(3):
        T = np.eye(4)
        T[:3, 3] = [0.2 * i, 0.0, 0.0]
        poses.append(T[:3].reshape(-1))
    np.savetxt(str(d3 / "poses.txt"), np.stack(poses))
    np.savetxt(str(d3 / "cam.txt"),
               np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]]))
    # 2-view folder
    d2 = root / "sun3d_two"
    for i in range(2):
        write_jpg(str(d2 / f"{i:04d}.jpg"), seed=10 + i)
        np.save(str(d2 / f"{i:04d}.npy"),
                np.full((48, 64), 5.0, dtype=np.float32))
    np.savetxt(str(d2 / "poses.txt"), np.stack(poses[:2]))
    np.savetxt(str(d2 / "cam.txt"),
               np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]]))
    with open(root / "train.txt", "w") as f:
        f.write("sun3d_three\nsun3d_two\n")
    return str(root)


def test_demon_mf_three_view(demon_mf_tree):
    """3-view mode: middle frame is the target, only 3-view folders kept."""
    from dro_sfm_tpu.data.demon_mf import DemonMFDataset
    ds = DemonMFDataset(demon_mf_tree, "train.txt", mode="validation",
                        back_context=1, forward_context=1)
    assert len(ds) == 1  # the two-view folder is filtered out
    s = ds[0]
    validate_sample(s)
    assert s["rgb_context"].shape == (2, 48, 64, 3)
    # target = frame 1 -> depth 3.0; context rel poses +-0.2 in x
    assert abs(float(s["depth"].max()) - 3.0) < 1e-6
    np.testing.assert_allclose(
        s["pose_context"][0][:3, 3], [-0.2, 0, 0], atol=1e-6)
    np.testing.assert_allclose(
        s["pose_context"][1][:3, 3], [0.2, 0, 0], atol=1e-6)


def test_demon_mf_two_view(demon_mf_tree):
    from dro_sfm_tpu.data.demon_mf import DemonMFDataset
    ds = DemonMFDataset(demon_mf_tree, "train.txt", mode="validation",
                        back_context=0, forward_context=1)
    assert len(ds) == 2
    s = ds[1]
    validate_sample(s)
    assert s["rgb_context"].shape == (1, 48, 64, 3)
    np.testing.assert_allclose(
        s["pose_context"][0][:3, 3], [0.2, 0, 0], atol=1e-6)


# ---------------------------------------------------------------------------
# ScanNet paired-tuple test reader + BA-split registrations
# ---------------------------------------------------------------------------

def test_scannet_test_tuples(scannet_tree):
    from dro_sfm_tpu.data.scannet import ScannetTestDataset
    root, _ = scannet_tree
    tuples = os.path.join(os.path.dirname(root), "tuples.txt")
    with open(tuples, "w") as f:
        f.write("scene0000_00/color 2.jpg 0.jpg 4.jpg\n")
        f.write("scene0000_00/color 5.jpg 3.jpg 7.jpg\n")
    ds = ScannetTestDataset(root, "tuples.txt", mode="validation")
    assert len(ds) == 2
    s = ds[0]
    validate_sample(s)
    assert s["rgb_context"].shape[0] == 2
    # context 0 is frame 0, target frame 2: rel translation -0.2 in x
    # (poses translate +0.1x per frame; rel = inv(ctx) @ target)
    np.testing.assert_allclose(
        s["pose_context"][0][:3, 3], [0.2, 0, 0], atol=1e-6)
    np.testing.assert_allclose(
        s["pose_context"][1][:3, 3], [-0.2, 0, 0], atol=1e-6)


@pytest.mark.parametrize("name", ["ScannetTestMF"])
def test_ba_split_registrations(scannet_tree, name):
    """Explicit-tuple registrations load split lines end to end through the
    config-driven `setup_dataset` dispatch (ScannetBA/MatterportBA moved to
    the real BA-Net paired reader — see the banet tests below)."""
    from dro_sfm_tpu.data import setup_dataset
    from dro_sfm_tpu.utils.config import load_config
    root, _ = scannet_tree
    tuples = os.path.join(os.path.dirname(root), "ba_tuples.txt")
    with open(tuples, "w") as f:
        f.write("scene0000_00/color 3.jpg 1.jpg 5.jpg\n")
    cfg = load_config(overrides={"datasets": {
        "augmentation": {"image_shape": [48, 64]},
        "validation": {
            "dataset": [name], "path": [root], "split": ["ba_tuples.txt"],
            "depth_type": ["groundtruth"]}}})
    (ds,) = setup_dataset(cfg.datasets.validation,
                          cfg.datasets.augmentation, "validation")
    assert len(ds) == 1
    s = ds[0]
    validate_sample(s)
    assert s["rgb_context"].shape[0] == 2


def test_image_dataset(tmp_path):
    from dro_sfm_tpu.data.video import ImageDataset
    root = tmp_path / "imgs"
    for i in range(5):
        write_jpg(str(root / "setA" / f"{i:03d}.jpg"), seed=i)
    ds = ImageDataset(str(root), mode="validation",
                      back_context=1, forward_context=1)
    assert len(ds) == 3
    s = ds[0]
    validate_sample(s)
    assert s["rgb_context"].shape == (2, 48, 64, 3)


# ---------------------------------------------------------------------------
# BA-Net paired splits (ScannetBA / MatterportBA)
# ---------------------------------------------------------------------------

@pytest.fixture
def banet_tree(tmp_path):
    """ScanNet-layout tree + BA-Net paired split file.

    Frames at multiples of 5 so the reference's +/-5, +/-10 context
    derivation (`scannet_banet_dataset.py:168-186`) lands on real frames.
    """
    root = tmp_path / "scans"
    scene = "scene0000_00"
    frames = [f"{i:06d}.jpg" for i in range(0, 60, 5)]
    for i, name in enumerate(frames):
        write_jpg(str(root / scene / "color" / name), seed=i)
        write_depth_png_mm(str(root / scene / "depth" /
                               name.replace(".jpg", ".png")))
        pose = np.eye(4)
        pose[:3, 3] = [0.1 * i, 0.0, 0.0]
        os.makedirs(root / scene / "pose", exist_ok=True)
        np.savetxt(root / scene / "pose" / name.replace(".jpg", ".txt"),
                   pose)
    os.makedirs(root / scene / "intrinsic", exist_ok=True)
    K = np.array([[100.0, 0, 32, 0], [0, 100.0, 24, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]])
    np.savetxt(root / scene / "intrinsic" / "intrinsic_color.txt", K)

    with open(tmp_path / "avail.txt", "w") as f:
        for name in frames:
            f.write(f"{scene}/color {name}\n")

    # Paired split: groups of 7 lines; line 0 = target, line 1 = BA
    # partner, the rest is ignored payload. Scene is path component 3
    # (`scannet_banet_dataset.py:167`).
    def group(target, partner):
        base = f"data/scannet/scans/{scene}"
        lines = [f"{base}/frame-{target}.color.jpg",
                 f"{base}/frame-{partner}.color.jpg"]
        lines += [f"{base}/ignored-{i}.txt" for i in range(5)]
        return "\n".join(lines) + "\n"

    os.makedirs(tmp_path / "splits", exist_ok=True)
    with open(tmp_path / "splits" / "banet_train.txt", "w") as f:
        f.write(group("000020", "000025"))   # forward partner
        f.write(group("000030", "000025"))   # backward partner
        f.write(group("000005", "000010"))   # c4 = -00005 -> filtered out
    return str(root)


def test_banet_dataset_parses_paired_split(banet_tree):
    from dro_sfm_tpu.data.banet import BANetDataset

    ds = BANetDataset(banet_tree, "avail.txt", mode="validation",
                      back_context=2, forward_context=2)
    # Third target dropped: its -10 context does not exist.
    assert len(ds) == 2
    assert ds.files == [("scene0000_00/color", "000020.jpg"),
                        ("scene0000_00/color", "000030.jpg")]
    # Forward partner: contexts (partner, -5, +5, -10).
    assert ds._sample_context(0, *ds.files[0]) == [
        "000025.jpg", "000015.jpg", "000025.jpg", "000010.jpg"]
    # Backward partner flips the offsets (+5, -5, +10).
    assert ds._sample_context(1, *ds.files[1]) == [
        "000025.jpg", "000035.jpg", "000025.jpg", "000040.jpg"]

    s = ds[0]
    validate_sample(s)
    assert s["rgb_context"].shape[0] == 4
    # rel pose to the -5 context (frame idx 3 vs target idx 4): -0.1 in x
    # under inv(ctx) @ pose... ctx at 0.1*3, target at 0.1*4 -> +0.1.
    np.testing.assert_allclose(s["pose_context"][1][:3, 3], [0.1, 0, 0],
                               atol=1e-6)
    assert abs(float(np.max(s["depth"])) - 2.5) < 1e-5


def test_banet_context_selection_modes(banet_tree):
    from dro_sfm_tpu.data.banet import BANetDataset

    for (back, fwd), n_ctx in (((1, 1), 2), ((0, 1), 1), ((-1, 1), 2)):
        ds = BANetDataset(banet_tree, "avail.txt", mode="validation",
                          back_context=back, forward_context=fwd)
        s = ds[0]
        assert s["rgb_context"].shape[0] == n_ctx, (back, fwd)
    # (1,1) picks (partner, derived-2), not a symmetric +/-1 window.
    ds = BANetDataset(banet_tree, "avail.txt", mode="validation",
                      back_context=1, forward_context=1)
    assert ds._sample_context(0, *ds.files[0]) == ["000025.jpg",
                                                   "000015.jpg"]
    # (-1,1) repeat-vs-pair choice is per-sample deterministic.
    ds = BANetDataset(banet_tree, "avail.txt", mode="validation",
                      back_context=-1, forward_context=1)
    first = ds._sample_context(0, *ds.files[0])
    assert first in (["000025.jpg", "000025.jpg"],
                     ["000025.jpg", "000015.jpg"])
    assert ds._sample_context(0, *ds.files[0]) == first

    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        BANetDataset(banet_tree, "avail.txt", back_context=2,
                     forward_context=0)


def test_banet_registered_names(banet_tree):
    """ScannetBA and MatterportBA resolve through the dataset registry."""
    from dro_sfm_tpu.data import setup_dataset
    from dro_sfm_tpu.utils.config import load_config

    cfg = load_config(overrides={"datasets": {
        "augmentation": {"image_shape": (48, 64)},
        "validation": {
            "dataset": ["ScannetBA", "MatterportBA"],
            "path": [banet_tree, banet_tree],
            "split": ["avail.txt", "avail.txt"],
            "depth_type": ["groundtruth", "groundtruth"],
            "back_context": 1, "forward_context": 1}}})
    datasets = setup_dataset(cfg.datasets.validation,
                             cfg.datasets.augmentation, "validation")
    assert len(datasets) == 2
    for ds in datasets:
        assert len(ds) == 2
        validate_sample(ds[0])
