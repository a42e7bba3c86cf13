"""Datasets, transforms, loading.

`setup_dataset` is the dispatch table equivalent of
`/root/reference/dro_sfm/models/model_wrapper.py:601-808`: dataset names from
the config select reader classes; per-split lists build one dataset per
(path, split) pair, concatenated (with repeats) for training.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Dict

from dro_sfm_tpu.data.base import Dataset, Sample, relative_pose, validate_sample
from dro_sfm_tpu.data.loader import (
    ConcatDataset,
    DataLoader,
    RepeatedDataset,
    collate,
    make_loader,
)
from dro_sfm_tpu.data.synthetic import SyntheticConfig, SyntheticDataset

_REGISTRY: Dict[str, Callable] = {}


def register_dataset(name: str):
    def wrap(fn):
        _REGISTRY[name] = fn
        return fn
    return wrap


def _synthetic_factory(path, split, mode, image_shape, jittering, section,
                       num_planes=1):
    """'Synthetic' dataset entry: ``path`` encodes the seed, ``split`` the
    scene count (fixture-free stand-in for KITTI_tiny). Scenes render
    NATIVELY at ``image_shape`` (the renderer is analytic — any resolution
    is exact), so flagship-resolution training (192x640) gets full-detail
    frames instead of upsampled 96x128 ones and the resize is a no-op.

    'SyntheticMulti' is the same generator with 3 nearest-hit composited
    planes per scene — non-degenerate depth structure for selfsup
    evaluation (single-plane scenes score a constant disparity map ~0.05
    abs_rel after median scaling; docs/convergence_selfsup_r5.md)."""
    n_ctx = int(section.back_context) + int(section.forward_context)
    cfg = SyntheticConfig(
        num_scenes=int(split) if str(split).isdigit() else 8,
        num_context=max(n_ctx, 1),
        seed=int(path) if str(path).isdigit() else 0,
        num_planes=num_planes)
    if image_shape:
        cfg.height, cfg.width = int(image_shape[0]), int(image_shape[1])
    return SyntheticDataset(cfg, mode=mode, image_shape=image_shape,
                            jittering=jittering if mode == "train" else ())


_REGISTRY["Synthetic"] = _synthetic_factory
_REGISTRY["SyntheticMulti"] = partial(_synthetic_factory, num_planes=3)


def setup_dataset(section, augmentation, mode: str) -> Dataset:
    """Build the dataset(s) for one split section of the config."""
    # Import for registration side effects; tolerate partial builds while the
    # full reader set lands.
    import importlib
    for mod in ("kitti", "scannet", "banet", "demon", "demon_mf",
                "matterport", "nyu", "video", "extra", "dgp"):
        try:
            importlib.import_module(f"dro_sfm_tpu.data.{mod}")
        except ImportError:
            pass

    names = list(section.dataset)
    if not names:
        raise ValueError(f"No dataset configured for mode {mode}")
    image_shape = tuple(augmentation.image_shape)
    jittering = tuple(augmentation.jittering)
    datasets = []
    for i, name in enumerate(names):
        if name not in _REGISTRY:
            raise KeyError(f"Unknown dataset {name!r}; known: "
                           f"{sorted(_REGISTRY)}")
        ds = _REGISTRY[name](
            path=section.path[i], split=section.split[i], mode=mode,
            image_shape=image_shape, jittering=jittering, section=section)
        repeat = section.repeat[i] if i < len(section.repeat) else 1
        if mode == "train" and repeat > 1:
            ds = RepeatedDataset(ds, repeat)
        datasets.append(ds)
    if mode == "train":
        return datasets[0] if len(datasets) == 1 else ConcatDataset(datasets)
    # Eval keeps datasets separate (`model_wrapper.py:105-130`): the trainer
    # evaluates each with its own metric prefix.
    return datasets


__all__ = [
    "ConcatDataset",
    "DataLoader",
    "Dataset",
    "RepeatedDataset",
    "Sample",
    "SyntheticConfig",
    "SyntheticDataset",
    "collate",
    "make_loader",
    "register_dataset",
    "relative_pose",
    "setup_dataset",
    "validate_sample",
]
