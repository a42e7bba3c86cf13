"""Configuration system: typed attribute tree + YAML overrides.

Replaces the reference's yacs stack (`/root/reference/configs/default_config.py`,
`/root/reference/dro_sfm/utils/config.py`) with a dependency-free ConfigNode.
The default tree mirrors the reference's ~90 keys so its YAML configs work
unmodified (minus torch-specific ones); dataset lists are broadcast the same
way (`utils/config.py:15-47` prep_dataset).
"""
from __future__ import annotations

import copy
import os
from typing import Any, Dict, Optional

import yaml


class ConfigNode:
    """A nested attribute dictionary with type-checked merging."""

    def __init__(self, init: Optional[Dict[str, Any]] = None):
        object.__setattr__(self, "_data", {})
        if init:
            for k, v in init.items():
                self._data[k] = ConfigNode(v) if isinstance(v, dict) else v

    # -- attribute access ---------------------------------------------------
    def __getattr__(self, key):
        try:
            return self._data[key]
        except KeyError:
            raise AttributeError(key)

    def __setattr__(self, key, value):
        self._data[key] = ConfigNode(value) if isinstance(value, dict) else value

    def __getitem__(self, key):
        return self._data[key]

    def __setitem__(self, key, value):
        setattr(self, key, value)

    def __contains__(self, key):
        return key in self._data

    def keys(self):
        return self._data.keys()

    def items(self):
        return self._data.items()

    def get(self, key, default=None):
        return self._data.get(key, default)

    def to_dict(self) -> Dict[str, Any]:
        return {k: v.to_dict() if isinstance(v, ConfigNode) else v
                for k, v in self._data.items()}

    def clone(self) -> "ConfigNode":
        return ConfigNode(copy.deepcopy(self.to_dict()))

    def merge_dict(self, other: Dict[str, Any], path: str = "") -> "ConfigNode":
        """Deep-merge ``other`` into this node (yacs merge_from_file
        semantics: unknown keys are an error, type changes are an error)."""
        for k, v in other.items():
            full = f"{path}.{k}" if path else k
            if k not in self._data:
                raise KeyError(f"Unknown config key: {full}")
            cur = self._data[k]
            if isinstance(cur, ConfigNode):
                if not isinstance(v, dict):
                    raise TypeError(f"Cannot override node {full} with a leaf")
                cur.merge_dict(v, full)
            else:
                self._data[k] = _coerce(cur, v, full)
        return self

    def __repr__(self):
        return f"ConfigNode({self.to_dict()})"


def _coerce(cur, new, path):
    if cur is None or new is None:
        return new
    # Tri-state perf knobs: the default is the string "auto", overridable
    # with an explicit bool (model.depth_net.remat) or string.
    if cur == "auto" or new == "auto":
        return new
    if isinstance(cur, bool) != isinstance(new, bool):
        raise TypeError(f"Type mismatch at {path}: {type(cur)} vs {type(new)}")
    if isinstance(cur, float) and isinstance(new, int):
        return float(new)
    if isinstance(cur, (tuple, list)) and isinstance(new, (tuple, list)):
        return type(cur)(new)
    # image_shape may be written as the yaml string "(192, 640)" (reference
    # config style) — keep it; prepare_config parses it into a tuple.
    if isinstance(cur, str) and isinstance(new, (tuple, list)):
        return new
    if isinstance(cur, (tuple, list)) and isinstance(new, str):
        return new
    if not isinstance(new, type(cur)) and not isinstance(cur, type(new)):
        raise TypeError(f"Type mismatch at {path}: {type(cur)} vs {type(new)}")
    return new


# ---------------------------------------------------------------------------
# Defaults (parity with /root/reference/configs/default_config.py:8-201)
# ---------------------------------------------------------------------------

def _dataset_section(batch_size, num_workers, back_context, forward_context):
    return {
        "batch_size": batch_size,
        "num_workers": num_workers,
        "back_context": back_context,
        "forward_context": forward_context,
        "dataset": [],
        "path": [],
        "split": [],
        "depth_type": [""],
        "cameras": [[]],
        "repeat": [1],
        "num_logs": 5,
        "strides": (1,),
    }


DEFAULTS: Dict[str, Any] = {
    "name": "",
    "debug": False,
    # spatial_shards: shard image heights over this many devices per data-
    # parallel replica (GSPMD spatial partitioning; see parallel/mesh.py).
    "arch": {"seed": 42, "min_epochs": 1, "max_epochs": 50,
             "spatial_shards": 1},
    "checkpoint": {
        "filepath": "./results/model",
        "save_top_k": 5,
        "monitor": "abs_rel_pp_gt",
        "monitor_index": 0,
        "mode": "auto",
        "s3_path": "",
        "s3_frequency": 1,
        "s3_url": "",
    },
    "save": {
        "folder": "./results",
        "depth": {"rgb": True, "viz": True, "npz": True, "png": True},
        "pretrained": "",
    },
    "wandb": {
        "dry_run": True, "name": "", "project": "", "entity": "",
        "tags": [], "dir": "", "url": "",
        # depth-image panels logged per eval dataset per epoch
        # (ref `wandb_logger.py:131-160` num_logs).
        "num_logs": 5,
    },
    "model": {
        "name": "",
        "checkpoint_path": "",
        "optimizer": {
            "name": "Adam",
            "depth": {"lr": 0.0002, "weight_decay": 0.0},
            "pose": {"lr": 0.0002, "weight_decay": 0.0},
            "momentum": 0.9,
            "clip_grad_norm": 0.0,
        },
        "scheduler": {
            "name": "StepLR", "step_size": 10, "gamma": 0.5,
            "T_max": 20, "eta_min": 1e-7,
            "milestones": [10, 15, 20, 25, 30, 35, 40, 45],
            # Linear lr ramp over the first N optimizer steps (0 = off,
            # reference parity). See training/state.py:lr_schedule.
            "warmup_steps": 0,
        },
        "params": {"crop": "", "min_depth": 0.0, "max_depth": 80.0},
        "loss": {
            "num_scales": 4,
            "progressive_scaling": 0.0,
            "flip_lr_prob": 0.5,
            "rotation_mode": "euler",
            "upsample_depth_maps": True,
            "ssim_loss_weight": 0.85,
            "occ_reg_weight": 0.1,
            "smooth_loss_weight": 0.001,
            "C1": 1e-4,
            "C2": 9e-4,
            "photometric_reduce_op": "min",
            "disp_norm": True,
            "clip_loss": 0.0,
            "padding_mode": "zeros",
            "automask_loss": True,
            "velocity_loss_weight": 0.1,
            "supervised_method": "sparse-l1",
            "supervised_num_scales": 4,
            "supervised_loss_weight": 0.9,
            # optional VGG16 perceptual term on the final prediction's
            # warps (net from model.percep_net.checkpoint_path)
            "percep_loss_weight": 0.0,
        },
        "depth_net": {"name": "", "checkpoint_path": "", "version": "",
                      "dropout": 0.0,
                      # TPU-specific perf/init knobs (no reference analog):
                      # bfloat16 convs (fp32 geometry), warp sampler choice,
                      # and a converted-resnet18 msgpack for ImageNet init
                      # (ref `networks/optim/extractor.py:56-65`).
                      # Perf defaults = the measured fast path on TPU v5e
                      # (tools/perf_ablate.py r2: bf16 + fully-unrolled
                      # refinement scans + fused Pallas tent-warp + no
                      # remat = 72.2 ms/step vs 123.6 fp32-gather-remat at
                      # b4 192x640 it12-h-out; pallas degrades to matmul
                      # off-TPU). remat/scan_unroll default to "auto": the
                      # memory policy (models/sfm.py resolve_memory_policy)
                      # re-enables remat above ~1.1M train batch-pixels —
                      # 192x640 b16 and the reference KITTI point 320x960
                      # b8 OOM on the no-remat fast path. True/False/named
                      # values pin the knob explicitly.
                      "mixed_precision": True,
                      "warp_impl": "pallas",
                      "sep_conv": "split",
                      "remat": "auto",
                      "scan_unroll": "auto",
                      "pretrained_encoders": ""},
        "pose_net": {"name": "", "checkpoint_path": "", "version": "",
                     "dropout": 0.0},
        "percep_net": {"name": "", "checkpoint_path": "", "version": "",
                       "dropout": 0.0},
    },
    "datasets": {
        "augmentation": {
            "image_shape": (192, 640),
            "jittering": (0.2, 0.2, 0.2, 0.05),
        },
        "train": _dataset_section(8, 16, 1, 1),
        "validation": _dataset_section(1, 8, 0, 0),
        "test": _dataset_section(1, 8, 0, 0),
    },
    "config": "",
    "default": "",
    "prepared": False,
}


def get_default_config() -> ConfigNode:
    return ConfigNode(copy.deepcopy(DEFAULTS))


def _parse_image_shape(value):
    if isinstance(value, str):
        value = value.strip("()[] ")
        return tuple(int(x) for x in value.split(","))
    return tuple(int(x) for x in value)


def prepare_config(cfg: ConfigNode) -> ConfigNode:
    """Post-merge fixups: image_shape tuples and dataset list broadcasting
    (`utils/config.py:15-47`)."""
    cfg.datasets.augmentation.image_shape = _parse_image_shape(
        cfg.datasets.augmentation.image_shape)
    for split in ("train", "validation", "test"):
        section = cfg.datasets[split]
        n = len(section.dataset)
        for key in ("path", "split", "depth_type", "cameras", "repeat"):
            val = list(section[key])
            if n == 0:
                continue
            if len(val) == 1 and n > 1:
                val = val * n
            while len(val) < n:
                val.append(val[-1] if val else "")
            section[key] = val
    return cfg


def load_config(yaml_path: Optional[str] = None,
                overrides: Optional[Dict[str, Any]] = None) -> ConfigNode:
    """Default config + optional YAML merge + optional dict overrides."""
    cfg = get_default_config()
    if yaml_path:
        with open(yaml_path) as f:
            data = yaml.safe_load(f) or {}
        cfg.merge_dict(data)
        cfg.config = yaml_path
        if not cfg.name:
            cfg.name = os.path.splitext(os.path.basename(yaml_path))[0]
    if overrides:
        cfg.merge_dict(overrides)
    return prepare_config(cfg)


def save_config(cfg: ConfigNode, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(_yaml_safe(cfg.to_dict()), f, sort_keys=False)


def _yaml_safe(obj):
    if isinstance(obj, dict):
        return {k: _yaml_safe(v) for k, v in obj.items()}
    if isinstance(obj, tuple):
        return [_yaml_safe(v) for v in obj]
    if isinstance(obj, list):
        return [_yaml_safe(v) for v in obj]
    return obj
