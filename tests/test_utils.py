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


def test_checkpoint_sync_file_mirror(tmp_path):
    """file:// sync mirrors saves and prunes (reference aws-s3-sync
    semantics, `model_checkpoint.py:12-21`)."""
    import numpy as np
    from dro_sfm_tpu.training.checkpoint import (
        CheckpointManager, sync_checkpoint_dir)

    local = tmp_path / "ckpts"
    remote = tmp_path / "bucket"
    mgr = CheckpointManager(str(local), monitor="abs_rel", save_top_k=1,
                            save_code=False,
                            sync_url=f"file://{remote}", sync_frequency=2)

    class FakeState:
        params = {"w": np.zeros(2)}
        batch_stats = {}
        opt_state = ()
        step = 0

    import dro_sfm_tpu.training.checkpoint as ckpt_mod
    saved_paths = []

    def fake_save(path, state, epoch, config=None):
        with open(path, "w") as f:
            f.write("x")
        saved_paths.append(path)

    orig = ckpt_mod.save_checkpoint
    ckpt_mod.save_checkpoint = fake_save
    try:
        mgr.check_and_save(FakeState(), 0, {"abs_rel": 0.5})
        assert not remote.exists() or not list(remote.iterdir())  # epoch 0: no sync (freq 2)
        mgr.check_and_save(FakeState(), 1, {"abs_rel": 0.4})      # epoch 1: sync
        names = {p.name for p in remote.iterdir()}
        # top-k=1 pruned the 0.5 checkpoint locally; remote mirrors that.
        assert any("0.400" in n for n in names)
        assert not any("0.500" in n for n in names)
    finally:
        ckpt_mod.save_checkpoint = orig

    # Direct call also handles plain paths and deletion.
    (local / "extra.txt").write_text("y")
    assert sync_checkpoint_dir(str(local), str(remote))
    assert (remote / "extra.txt").exists()
    (local / "extra.txt").unlink()
    assert sync_checkpoint_dir(str(local), str(remote))
    assert not (remote / "extra.txt").exists()


def test_checkpoint_sync_catches_up_off_schedule_saves(tmp_path):
    """A save landing on an off-schedule epoch must reach the mirror at the
    next scheduled epoch even if that epoch saves nothing (regression:
    sync used to require save-epoch and schedule-epoch to coincide)."""
    import numpy as np
    from dro_sfm_tpu.training.checkpoint import CheckpointManager

    local = tmp_path / "ckpts"
    remote = tmp_path / "bucket"
    mgr = CheckpointManager(str(local), monitor="abs_rel", save_top_k=1,
                            save_code=False,
                            sync_url=f"file://{remote}", sync_frequency=2)

    class FakeState:
        params = {"w": np.zeros(2)}
        batch_stats = {}
        opt_state = ()
        step = 0

    import dro_sfm_tpu.training.checkpoint as ckpt_mod

    def fake_save(path, state, epoch, config=None):
        with open(path, "w") as f:
            f.write("x")

    orig = ckpt_mod.save_checkpoint
    ckpt_mod.save_checkpoint = fake_save
    try:
        # Epoch 0 improves ((0+1)%2 != 0 -> no sync yet); epoch 1 does NOT
        # improve but is a scheduled epoch -> the pending save must sync.
        mgr.check_and_save(FakeState(), 0, {"abs_rel": 0.5})
        assert not remote.exists() or not list(remote.iterdir())
        mgr.check_and_save(FakeState(), 1, {"abs_rel": 0.9})
        assert any("0.500" in p.name for p in remote.iterdir())
        # Nothing new since the last sync: epoch 3 re-sync is skipped (no
        # pending flag), which we can only observe as not crashing on a
        # removed remote.
        assert mgr._sync_pending is False
    finally:
        ckpt_mod.save_checkpoint = orig


def test_compilation_cache_default(monkeypatch):
    """CLIs default the persistent compile cache on; an explicit env var
    (even empty = disabled) is never overridden."""
    import jax

    from dro_sfm_tpu.utils.misc import enable_compilation_cache

    orig = jax.config.jax_compilation_cache_dir
    orig_min_secs = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
        enable_compilation_cache()
        assert jax.config.jax_compilation_cache_dir.endswith("jax_cache")

        jax.config.update("jax_compilation_cache_dir", "/explicit")
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "")
        enable_compilation_cache()
        assert jax.config.jax_compilation_cache_dir == "/explicit"
    finally:
        jax.config.update("jax_compilation_cache_dir", orig)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", orig_min_secs)
