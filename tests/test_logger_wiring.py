"""Experiment-logger wiring: the trainer must push per-step train metrics
and periodic validation depth-image panels into the logger (VERDICT r1 #7;
ref `/root/reference/dro_sfm/loggers/wandb_logger.py:131-170` and the
per-step 'loss'/'learning rate' logging in `model_wrapper.py:229-247`).
Uses a recording fake logger — no wandb dependency.
"""
import numpy as np
import pytest

from dro_sfm_tpu.utils.config import load_config


class RecordingLogger:
    def __init__(self):
        self.configs = []
        self.metrics = []
        self.images = []
        self.finished = False

    def log_config(self, config):
        self.configs.append(config)

    def log_metrics(self, metrics):
        self.metrics.append(dict(metrics))

    def log_depth_images(self, prefix, batch, output, step=0):
        self.images.append((prefix, step,
                            np.asarray(output["inv_depth_pp"]).shape))

    def finish(self):
        self.finished = True


@pytest.mark.slow
def test_trainer_logs_steps_and_depth_panels(tmp_path, monkeypatch):
    import dro_sfm_tpu.loggers as loggers
    from dro_sfm_tpu.training.trainer import Trainer

    rec = RecordingLogger()
    monkeypatch.setattr(loggers, "make_logger", lambda *a, **k: rec)

    cfg = load_config(overrides={
        "name": "logger_smoke",
        "arch": {"max_epochs": 1},
        "checkpoint": {"filepath": str(tmp_path / "ckpt"), "save_top_k": 1},
        "model": {
            "name": "SupModelMF",
            "depth_net": {"name": "DepthPoseNet", "version": "it2-h-out"},
            "params": {"crop": "", "min_depth": 0.2, "max_depth": 20.0},
            "loss": {"flip_lr_prob": 0.0},
        },
        "datasets": {
            "augmentation": {"image_shape": (32, 48)},
            "train": {"batch_size": 2, "num_workers": 2,
                      "dataset": ["Synthetic"], "path": ["0"],
                      "split": ["4"], "repeat": [5],
                      "back_context": 1, "forward_context": 1},
            "validation": {"batch_size": 2, "num_workers": 2,
                           "dataset": ["Synthetic"], "path": ["1"],
                           "split": ["4"], "back_context": 1,
                           "forward_context": 1},
            "test": {"dataset": [], "path": [], "split": []},
        },
    })
    trainer = Trainer(cfg)
    assert trainer.logger is rec
    assert len(rec.configs) == 1          # config logged at construction
    trainer.fit()

    # Per-step train metrics: loss + lr reach the logger, not only stdout.
    step_logs = [m for m in rec.metrics if "train-loss-step" in m]
    assert step_logs, "no per-step train metrics logged"
    assert all("learning_rate" in m for m in step_logs)
    assert np.isfinite([m["train-loss-step"] for m in step_logs]).all()

    # Epoch-end metrics (validation results) logged once.
    epoch_logs = [m for m in rec.metrics if "epoch" in m]
    assert len(epoch_logs) == 1
    assert "abs_rel_pp_gt" in epoch_logs[0]

    # Depth-image panels from validation (first batch at least).
    assert rec.images, "no depth panels logged from validation"
    prefix, step, shape = rec.images[0]
    assert "Synthetic" in prefix
    assert shape[-3:] == (32, 48, 1)
