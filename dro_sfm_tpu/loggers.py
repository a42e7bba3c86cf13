"""Experiment loggers: wandb (optional) with a no-op fallback.

Rebuild of `/root/reference/dro_sfm/loggers/wandb_logger.py`: run lifecycle,
config/metric logging and periodic depth-image panels. wandb is not a hard
dependency — when it is missing or `dry_run` is set, the logger degrades to
a silent stub so training code never branches.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np


class NoOpLogger:
    """Swallow all logging calls (wandb.dry_run equivalent)."""

    def log_config(self, config) -> None:  # noqa: D102
        pass

    def log_metrics(self, metrics: Dict) -> None:  # noqa: D102
        pass

    def log_depth_images(self, prefix, batch, output, step: int = 0) -> None:  # noqa: D102
        pass

    def finish(self) -> None:  # noqa: D102
        pass


class WandbLogger(NoOpLogger):
    """Weights & Biases logger (`wandb_logger.py:43-271`)."""

    def __init__(self, name: str = "", project: str = "", entity: str = "",
                 tags=(), dir: str = "", num_logs: int = 5):
        import wandb  # raises ImportError -> caller falls back to NoOp
        self._wandb = wandb
        self.num_logs = num_logs
        self.run = wandb.init(name=name or None, project=project or None,
                              entity=entity or None, tags=list(tags),
                              dir=dir or None)

    def log_config(self, config) -> None:
        self.run.config.update(
            config.to_dict() if hasattr(config, "to_dict") else config,
            allow_val_change=True)

    def log_metrics(self, metrics: Dict) -> None:
        self._wandb.log({k: float(v) for k, v in metrics.items()})

    def log_depth_images(self, prefix, batch, output, step: int = 0) -> None:
        """Periodic rgb + inverse-depth panels (`wandb_logger.py:131-170`)."""
        from dro_sfm_tpu.utils.depth import viz_inv_depth
        rgb = np.asarray(batch["rgb"][0])
        inv = np.asarray(output["inv_depth_pp"][0])
        self._wandb.log({
            f"{prefix}-rgb": self._wandb.Image(rgb),
            f"{prefix}-inv_depth": self._wandb.Image(viz_inv_depth(inv)),
        }, step=step)

    def finish(self) -> None:
        self.run.finish()


def make_logger(wandb_cfg, name: str = "") -> NoOpLogger:
    """Build the configured logger; silently degrade without wandb."""
    if getattr(wandb_cfg, "dry_run", True):
        return NoOpLogger()
    try:
        return WandbLogger(name=wandb_cfg.name or name,
                           project=wandb_cfg.project,
                           entity=wandb_cfg.entity,
                           tags=wandb_cfg.tags, dir=wandb_cfg.dir)
    except ImportError:
        return NoOpLogger()
