"""Coverage for save artifacts, image grid, logging, profiler, misc."""
import os

import numpy as np


def test_save_depth_artifacts(tmp_path):
    from dro_sfm_tpu.utils.config import load_config
    from dro_sfm_tpu.utils.save import save_depth

    cfg = load_config(overrides={"save": {"folder": str(tmp_path)}})
    rng = np.random.default_rng(0)
    batch = {
        "filename": ["scene_000001", "scene_000002"],
        "rgb": rng.uniform(size=(2, 16, 20, 3)).astype(np.float32),
        "intrinsics": np.broadcast_to(np.eye(3, dtype=np.float32), (2, 3, 3)),
        "valid": np.array([True, False]),
    }
    output = {"inv_depth_pp": rng.uniform(
        0.1, 0.5, size=(2, 16, 20, 1)).astype(np.float32)}
    save_depth(batch, output, cfg.save)
    files = sorted(os.listdir(tmp_path))
    # Only the valid sample saved; all four artifact kinds present.
    assert any(f.endswith("_depth.npz") for f in files)
    assert any(f.endswith("_depth.png") for f in files)
    assert any(f.endswith("_rgb.png") for f in files)
    assert any(f.endswith("_viz.png") for f in files)
    assert not any("000002" in f for f in files)


def test_image_grid_and_gif(tmp_path):
    from dro_sfm_tpu.visualization.image_grid import (
        ImageGrid,
        write_gif,
        write_video,
    )
    rng = np.random.default_rng(0)
    grid = ImageGrid(1, 2, 16, 20)
    grid.set_cell(0, 0, rng.uniform(size=(16, 20, 3)), label="rgb")
    grid.set_cell(0, 1, rng.uniform(size=(8, 10)))  # resized + gray->rgb
    assert grid.canvas.shape == (16 + 2 * 4, 2 * 20 + 3 * 4, 3)

    frames = [rng.uniform(size=(16, 20, 3)) for _ in range(3)]
    write_gif(str(tmp_path / "a.gif"), frames)
    write_video(str(tmp_path / "a.mp4"), frames)
    assert (tmp_path / "a.gif").stat().st_size > 0
    assert (tmp_path / "a.mp4").stat().st_size > 0


def test_setup_log_records_git(tmp_path):
    from dro_sfm_tpu.utils.setup_log import git_info, setup_log

    info = git_info("/root/repo")
    assert len(info["sha"]) == 40
    logger = setup_log("unittest", log_dir=str(tmp_path))
    logger.info("hello")
    text = (tmp_path / "unittest.log").read_text()
    assert "git sha=" in text and "hello" in text


def test_step_timer():
    from dro_sfm_tpu.utils.profiler import StepTimer

    t = StepTimer()
    for _ in range(3):
        t.start()
        t.stop()
    s = t.stats()
    assert s["steps"] == 3 and s["mean_ms"] >= 0


def test_checkpoint_mode_auto():
    from dro_sfm_tpu.training.checkpoint import CheckpointManager
    import tempfile

    d = tempfile.mkdtemp()
    assert CheckpointManager(d, monitor="abs_rel_pp_gt").mode == "min"
    assert CheckpointManager(d, monitor="a1_gt").mode == "max"


def test_misc_helpers():
    from dro_sfm_tpu.utils.misc import filter_dict, make_list, same_shape

    assert filter_dict({"a": 1, "b": 2}, ["b", "c"]) == ["b"]
    assert make_list(3, 2) == [3, 3]
    assert make_list([1, 2]) == [1, 2]
    assert same_shape((1, 2), (1, 2)) and not same_shape((1,), (1, 2))
