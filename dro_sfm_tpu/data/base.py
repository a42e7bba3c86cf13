"""Dataset protocol and the shared sample-dict schema.

The schema mirrors the reference's sample dict
(`/root/reference/dro_sfm/datasets/kitti_dataset.py:348-406`,
`scannet_dataset.py:184-229`) in channel-last numpy:

======================  =============================  =======================
key                     shape / type                   notes
======================  =============================  =======================
idx                     int                            dataset index
filename                str                            split-relative id
rgb                     [H,W,3] float32 in [0,1]       jittered for training
rgb_original            [H,W,3] float32                pre-jitter copy (train)
rgb_context             [N,H,W,3] float32              N = back+forward ctx
rgb_context_original    [N,H,W,3] float32              (train)
intrinsics              [3,3] float32                  rescaled to image size
depth                   [H,W,1] float32, 0 = invalid   optional (supervised)
pose_context            [N,4,4] float32                T_{ctx<-target}, optional
==============================================================================

Datasets produce *fixed* context counts per configuration (TPU static-shape
requirement); variable-context reference datasets pad or filter instead.
"""
from __future__ import annotations

import zlib
from typing import Dict, Protocol

import numpy as np

Sample = Dict[str, object]


class Dataset(Protocol):
    def __len__(self) -> int: ...

    def __getitem__(self, idx: int) -> Sample: ...


def sample_rng(dataset, *key) -> np.random.Generator:
    """Per-sample augmentation RNG: stable across processes, fresh per epoch.

    Python's salted ``hash()`` differs between interpreter runs, and a
    purely path-keyed seed repeats the same jitter every epoch — so the seed
    here is crc32 (process-stable) of the key parts mixed with the dataset's
    current epoch (set by `DataLoader.set_epoch`).
    """
    epoch = getattr(dataset, "epoch", 0)
    digest = zlib.crc32(repr(key).encode())
    return np.random.default_rng((digest * 2654435761 + epoch) % (2 ** 63))


def set_dataset_epoch(dataset, epoch: int) -> None:
    """Recursively stamp ``epoch`` through wrapper datasets."""
    if hasattr(dataset, "datasets"):       # ConcatDataset
        for d in dataset.datasets:
            set_dataset_epoch(d, epoch)
    elif hasattr(dataset, "dataset"):      # RepeatedDataset etc.
        set_dataset_epoch(dataset.dataset, epoch)
    try:
        dataset.epoch = epoch
    except AttributeError:
        pass


def relative_pose(pose_target: np.ndarray, pose_ctx: np.ndarray) -> np.ndarray:
    """T_{ctx<-target} from camera-to-world poses of both frames.

    Parity: `scannet_dataset.py:205` — ``inv(ctx_pose) @ target_pose``.
    """
    return np.linalg.inv(pose_ctx) @ pose_target


def validate_sample(sample: Sample) -> None:
    """Cheap schema assertions used by dataset tests."""
    rgb = sample["rgb"]
    assert rgb.ndim == 3 and rgb.shape[-1] == 3, rgb.shape
    assert rgb.dtype == np.float32
    ctx = sample["rgb_context"]
    assert ctx.ndim == 4 and ctx.shape[1:] == rgb.shape
    K = sample["intrinsics"]
    assert K.shape == (3, 3)
    if "depth" in sample:
        d = sample["depth"]
        assert d.shape == (*rgb.shape[:2], 1), d.shape
    if "pose_context" in sample:
        p = sample["pose_context"]
        assert p.shape == (ctx.shape[0], 4, 4)
