"""End-to-end training integration: overfit a synthetic batch, trainer smoke.

The reference's de-facto integration test is the KITTI_tiny overfit config
(`/root/reference/README.md:95-103`, SURVEY.md §4); the synthetic dataset
plays that role here with exact ground truth and no data download.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dro_sfm_tpu.data import SyntheticConfig, SyntheticDataset, collate
from dro_sfm_tpu.models.sfm import SfmModelConfig
from dro_sfm_tpu.training.state import create_train_state, make_optimizer
from dro_sfm_tpu.training.step import make_eval_step, make_train_step
from dro_sfm_tpu.training.metrics import MetricsConfig
from dro_sfm_tpu.utils.config import load_config


def synthetic_batch(n_scenes=2, h=64, w=96):
    ds = SyntheticDataset(
        SyntheticConfig(num_scenes=n_scenes, height=h, width=w,
                        num_context=2),
        mode="train", jittering=(0.2, 0.2, 0.2, 0.05))
    batch = collate([ds[i] for i in range(n_scenes)])
    return {k: jnp.asarray(v) for k, v in batch.items()
            if isinstance(v, np.ndarray)}


@pytest.mark.slow
@pytest.mark.parametrize("version", ["it4-h-out", "it4-h"])
def test_overfit_single_batch_supervised(version):
    """120 Adam steps on one batch must cut the supervised loss by >50%
    (measured convergence: 2.3 -> 0.61 at step 120, 0.25 at 240, lr 1e-3).
    Covers both output heads: normalized (-out, ScanNet recipes) and raw
    inverse depth (the reference's KITTI recipe, `it12-h`)."""
    import optax

    model_cfg = SfmModelConfig(name="SupModelMF", version=version,
                               min_depth=0.2, max_depth=20.0,
                               flip_lr_prob=0.0)
    net = model_cfg.build_net()
    batch = synthetic_batch()

    tx = optax.adam(1e-3)
    state = create_train_state(
        net, jax.random.PRNGKey(0),
        {k: batch[k] for k in ("rgb", "rgb_context", "intrinsics")}, tx)
    step = make_train_step(model_cfg, net)

    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(120):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])


@pytest.mark.slow
def test_trainer_epoch_and_validation(tmp_path):
    """One Trainer epoch on synthetic data: runs, validates, checkpoints."""
    from dro_sfm_tpu.training.trainer import Trainer

    cfg = load_config(overrides={
        "name": "synthetic_smoke",
        "arch": {"max_epochs": 1},
        "checkpoint": {"filepath": str(tmp_path / "ckpt"), "save_top_k": 1},
        "model": {
            "name": "SupModelMF",
            "depth_net": {"name": "DepthPoseNet", "version": "it4-h-out"},
            "params": {"crop": "", "min_depth": 0.2, "max_depth": 20.0},
            "loss": {"flip_lr_prob": 0.0},
        },
        "datasets": {
            "augmentation": {"image_shape": (64, 96)},
            "train": {"batch_size": 2, "num_workers": 2, "dataset": ["Synthetic"],
                      "path": ["0"], "split": ["4"], "repeat": [2],
                      "back_context": 1, "forward_context": 1},
            "validation": {"batch_size": 2, "num_workers": 2,
                           "dataset": ["Synthetic"], "path": ["1"],
                           "split": ["3"], "back_context": 1,
                           "forward_context": 1},
            "test": {"dataset": [], "path": [], "split": []},
        },
    })
    trainer = Trainer(cfg)
    metrics = trainer.fit()
    assert np.isfinite(metrics["avg_train-loss"])
    assert "abs_rel_pp_gt" in metrics
    assert np.isfinite(metrics["abs_rel_pp_gt"])
    # checkpoint got written
    saved = list((tmp_path / "ckpt").glob("*.ckpt"))
    assert len(saved) == 1


@pytest.mark.slow  # re-tiered r5: >25s call (results/pytest_fast_r5_durations.log)
def test_eval_step_modes():
    """Eval step produces per-sample metrics for all four modes."""
    model_cfg = SfmModelConfig(name="SupModelMF", version="it4-h-out",
                               min_depth=0.2, max_depth=20.0)
    net = model_cfg.build_net()
    batch = synthetic_batch(n_scenes=2)
    variables = net.init(jax.random.PRNGKey(0), batch["rgb"],
                         batch["rgb_context"], batch["intrinsics"],
                         train=False)
    eval_step = make_eval_step(model_cfg, net,
                               MetricsConfig(min_depth=0.2, max_depth=20.0))
    out = eval_step(variables, batch)
    assert out["metrics"].shape == (4, 2, 9)
    assert np.isfinite(np.asarray(out["metrics"])).all()
    assert out["pose"].shape == (2, 2, 4, 4)
    assert out["inv_depth_pp"].shape == batch["rgb"].shape[:3] + (1,)


@pytest.mark.slow
def test_demon_scaling_dispatched_per_dataset(tmp_path):
    """Mixed validation lists apply demon scaling only to the Demon entry
    (ref `model_wrapper.py:383-384` scales per eval dataset; round-2's
    single trainer-global flag mis-scaled every co-validated dataset)."""
    from dro_sfm_tpu.training.trainer import Trainer

    cfg = load_config(overrides={
        "name": "demon_dispatch",
        "arch": {"max_epochs": 1},
        "checkpoint": {"filepath": str(tmp_path / "ckpt"), "save_top_k": 1},
        "model": {
            "name": "SupModelMF",
            "depth_net": {"name": "DepthPoseNet", "version": "it4-h-out"},
            "params": {"crop": "", "min_depth": 0.2, "max_depth": 20.0},
            "loss": {"flip_lr_prob": 0.0},
        },
        "datasets": {
            "augmentation": {"image_shape": (64, 96)},
            "train": {"batch_size": 2, "num_workers": 0,
                      "dataset": ["Synthetic"], "path": ["0"],
                      "split": ["2"], "back_context": 1,
                      "forward_context": 1},
            "validation": {"batch_size": 2, "num_workers": 0,
                           "dataset": ["Synthetic", "Synthetic"],
                           "path": ["1", "2"], "split": ["2", "2"],
                           "back_context": 1, "forward_context": 1},
            "test": {"dataset": [], "path": [], "split": []},
        },
    })
    trainer = Trainer(cfg)
    # The eval-step cache builds one jitted step per scaling mode.
    assert trainer.eval_step_for(False) is trainer.eval_step_for(False)
    assert trainer.eval_step_for(True) is not trainer.eval_step_for(False)

    # Present the second Synthetic dataset as 'Demon' to the dispatcher:
    # validate_all must request demon scaling for it and ONLY it.
    trainer.cfg.datasets.validation.dataset = ["Synthetic", "Demon"]
    seen = []
    orig_validate = trainer.validate

    def spy(loader=None, dataset_name="validation", save_artifacts=False,
            demon_scaling=False):
        seen.append((dataset_name, demon_scaling))
        return orig_validate(loader, dataset_name=dataset_name,
                             save_artifacts=save_artifacts,
                             demon_scaling=demon_scaling)

    trainer.validate = spy
    trainer.validate_all()
    assert seen == [("Synthetic-2", False), ("Demon-2", True)]


@pytest.mark.slow
def test_resume_exactness(tmp_path):
    """Checkpoint -> restore reproduces params, optimizer state and step
    exactly, and the Trainer resumes at the next epoch."""
    import optax

    from dro_sfm_tpu.training.checkpoint import load_checkpoint, save_checkpoint

    model_cfg = SfmModelConfig(name="SupModelMF", version="it4-h-out",
                               min_depth=0.2, max_depth=20.0,
                               flip_lr_prob=0.0)
    net = model_cfg.build_net()
    batch = synthetic_batch()
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    state = create_train_state(
        net, jax.random.PRNGKey(0),
        {k: batch[k] for k in ("rgb", "rgb_context", "intrinsics")}, tx)
    step = make_train_step(model_cfg, net)
    rng = jax.random.PRNGKey(1)
    for _ in range(3):
        state, _ = step(state, batch, rng)

    path = str(tmp_path / "resume.ckpt")
    save_checkpoint(path, state, epoch=4, config={"x": 1})

    fresh = create_train_state(
        net, jax.random.PRNGKey(123),
        {k: batch[k] for k in ("rgb", "rgb_context", "intrinsics")}, tx)
    restored = load_checkpoint(path, fresh)
    p = restored["payload"]
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(p["params"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # optimizer moments restored exactly
    oa = jax.tree_util.tree_leaves(state.opt_state)
    ob = jax.tree_util.tree_leaves(p["opt_state"])
    assert len(oa) == len(ob)
    for x, y in zip(oa, ob):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert p["step"] == 3
    assert restored["meta"]["epoch"] == 4

    # One step from the original and one from the restored match exactly.
    fresh2 = fresh.replace(params=p["params"], batch_stats=p["batch_stats"],
                           opt_state=p["opt_state"],
                           step=jnp.asarray(p["step"], jnp.int32))
    s1, m1 = step(state, batch, rng)
    s2, m2 = step(fresh2, batch, rng)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)


def test_lr_warmup_schedule():
    """scheduler.warmup_steps ramps every schedule linearly from ~0 and
    hands over exactly at the configured step; default 0 is bit-exact
    reference behavior (training/state.py:lr_schedule)."""
    from dro_sfm_tpu.training.state import lr_schedule

    base = lr_schedule("StepLR", 2e-4, steps_per_epoch=64)
    warm = lr_schedule("StepLR", 2e-4, steps_per_epoch=64,
                       warmup_steps=192)
    assert float(warm(0)) == pytest.approx(2e-4 / 192)
    assert float(warm(95)) == pytest.approx(2e-4 * 96 / 192)
    for s in (191, 200, 640):
        assert float(warm(s)) == pytest.approx(float(base(s)))
    # warmup composes with the decaying schedule, not replaces it
    decayed = lr_schedule("MultiStepLR", 2e-4, steps_per_epoch=1,
                          milestones=(5,), gamma=0.5, warmup_steps=4)
    assert float(decayed(1)) == pytest.approx(2e-4 * 2 / 4)
    assert float(decayed(10)) == pytest.approx(1e-4)


def test_per_group_learning_rates():
    """make_optimizer applies optimizer.pose.lr to the pose_net subtree and
    optimizer.depth.lr to everything else (`model_wrapper.py:160-209`)."""
    cfg = load_config(overrides={
        "model": {"optimizer": {"name": "SGD",
                                "depth": {"lr": 0.1},
                                "pose": {"lr": 0.001}}}})
    tx = make_optimizer(cfg.model.optimizer, cfg.model.scheduler,
                        steps_per_epoch=100)
    params = {"depth_net": {"w": jnp.ones(3)}, "pose_net": {"w": jnp.ones(3)}}
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    np.testing.assert_allclose(updates["depth_net"]["w"], -0.1, rtol=1e-6)
    np.testing.assert_allclose(updates["pose_net"]["w"], -0.001, rtol=1e-6)


@pytest.mark.slow
def test_single_frame_trainer_epoch(tmp_path):
    """The single-frame task model (separate DepthResNet + PoseResNet)
    trains end-to-end through the Trainer: finite loss, metrics, ckpt."""
    from dro_sfm_tpu.training.trainer import Trainer

    cfg = load_config(overrides={
        "name": "single_frame_smoke",
        "arch": {"max_epochs": 1},
        "checkpoint": {"filepath": str(tmp_path / "ckpt"), "save_top_k": 1},
        "model": {
            "name": "SupModel",
            "depth_net": {"name": "DepthResNet"},
            "pose_net": {"name": "PoseResNet"},
            "params": {"crop": "", "min_depth": 0.2, "max_depth": 20.0},
            "loss": {"flip_lr_prob": 0.0},
        },
        "datasets": {
            "augmentation": {"image_shape": (64, 96)},
            "train": {"batch_size": 2, "num_workers": 2,
                      "dataset": ["Synthetic"], "path": ["0"],
                      "split": ["4"], "repeat": [2],
                      "back_context": 1, "forward_context": 1},
            "validation": {"batch_size": 2, "num_workers": 2,
                           "dataset": ["Synthetic"], "path": ["1"],
                           "split": ["3"], "back_context": 1,
                           "forward_context": 1},
            "test": {"dataset": [], "path": [], "split": []},
        },
    })
    trainer = Trainer(cfg)
    metrics = trainer.fit()
    assert np.isfinite(metrics["avg_train-loss"])
    assert np.isfinite(metrics["abs_rel_pp_gt"])
    assert len(list((tmp_path / "ckpt").glob("*.ckpt"))) == 1


@pytest.mark.slow  # re-tiered r5: >25s call (results/pytest_fast_r5_durations.log)
def test_overfit_kitti_config_through_cli(tmp_path):
    """The reference's de-facto integration test is overfit_kitti via the
    train CLI; this drives configs/overfit_kitti.yaml against the on-disk
    KITTI fixture tree end to end (reader -> trainer -> ckpt)."""
    from tests.test_datasets import build_kitti_tree
    from dro_sfm_tpu.training.trainer import Trainer

    root = build_kitti_tree(tmp_path)
    cfg = load_config("configs/overfit_kitti.yaml", overrides={
        "arch": {"max_epochs": 1},
        "checkpoint": {"filepath": str(tmp_path / "ckpt")},
        "model": {"depth_net": {"version": "it4-h-out-seq2"}},
        "datasets": {
            "train": {"path": [root], "repeat": [1]},
            "validation": {"path": [root]},
        },
    })
    trainer = Trainer(cfg)
    metrics = trainer.fit()
    assert np.isfinite(float(metrics["avg_train-loss"]))
    import os
    assert any(f.endswith(".ckpt") for f in os.listdir(tmp_path / "ckpt"))


@pytest.mark.slow
def test_preemption_checkpoints_and_resumes(tmp_path):
    """SIGTERM during fit saves an emergency checkpoint; resuming from it
    re-runs the interrupted epoch (beyond-reference graceful preemption —
    the reference has no recovery path, SURVEY.md §5)."""
    import os
    import signal
    import threading

    from dro_sfm_tpu.training.trainer import Trainer

    def make_cfg(max_epochs):
        return load_config(overrides={
            "name": "preempt_smoke",
            "arch": {"max_epochs": max_epochs},
            "checkpoint": {"filepath": str(tmp_path / "ckpt"),
                           "save_top_k": 1},
            "model": {
                "name": "SupModelMF",
                "depth_net": {"name": "DepthPoseNet",
                              "version": "it4-h-out-seq2"},
                "params": {"crop": "", "min_depth": 0.2, "max_depth": 20.0},
                "loss": {"flip_lr_prob": 0.0},
            },
            "datasets": {
                "augmentation": {"image_shape": (48, 64)},
                "train": {"batch_size": 2, "num_workers": 2,
                          "dataset": ["Synthetic"], "path": ["0"],
                          "split": ["4"], "repeat": [1],
                          "back_context": 1, "forward_context": 1},
                "validation": {"batch_size": 2, "num_workers": 2,
                               "dataset": ["Synthetic"], "path": ["1"],
                               "split": ["3"], "back_context": 1,
                               "forward_context": 1},
                "test": {"dataset": [], "path": [], "split": []},
            },
        })

    trainer = Trainer(make_cfg(max_epochs=50))
    # Deliver a real SIGTERM shortly after fit starts; the handler must
    # flip the flag and fit must exit with the emergency checkpoint long
    # before the 50 configured epochs.
    killer = threading.Timer(1.0, os.kill, (os.getpid(), signal.SIGTERM))
    killer.start()
    try:
        trainer.fit()
    finally:
        killer.cancel()
    assert trainer._preempted
    preempts = list((tmp_path / "ckpt").glob("preempt_epoch=*.ckpt"))
    assert len(preempts) == 1
    # The original SIGTERM disposition is restored after fit.
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL

    # Resume from the emergency checkpoint and finish 1 epoch cleanly.
    cfg2 = make_cfg(max_epochs=trainer.current_epoch + 1)
    trainer2 = Trainer(cfg2, resume=str(preempts[0]))
    metrics = trainer2.fit()
    assert np.isfinite(metrics["avg_train-loss"])
