"""Unlabeled video-frame and flat image-folder datasets.

Rebuild of `/root/reference/dro_sfm/datasets/video_dataset.py`,
`video_random_dataset.py` and `image_dataset.py`: directories of sequential
frames, dummy intrinsics (fx = fy = 1.2 * W, principal point at the center),
no depth/pose GT — the self-supervised-only input path.
"""
from __future__ import annotations

import os
import re
from collections import defaultdict
from typing import Sequence

import numpy as np

from dro_sfm_tpu.data.base import Sample, sample_rng
from dro_sfm_tpu.data.kitti import load_image_rgb
from dro_sfm_tpu.data.transforms import eval_transform, train_transform

IMG_EXT = (".png", ".jpg", ".jpeg", ".bmp")


def dummy_calibration(w: int, h: int) -> np.ndarray:
    """`video_dataset.py:18-25` convention."""
    return np.array([[w * 1.2, 0.0, w / 2.0],
                     [0.0, w * 1.2, h / 2.0],
                     [0.0, 0.0, 1.0]], dtype=np.float32)


def frame_index(filename: str) -> int:
    m = re.search(r"\d+", filename)
    return int(m.group()) if m else -1


def scan_image_tree(root_dir: str) -> dict:
    """Recursively collect image files per directory
    (`image_dataset.py` read_files)."""
    tree = defaultdict(list)
    for entry in sorted(os.scandir(root_dir), key=lambda e: e.name):
        rel = os.path.relpath(entry.path, root_dir)
        if entry.is_dir():
            sub = scan_image_tree(entry.path)
            if sub.get(entry.path):
                tree[rel] = sub[entry.path]
        elif entry.name.lower().endswith(IMG_EXT):
            tree[root_dir].append(rel)
    return tree


class VideoDataset:
    """Sequential frames grouped by folder; context by frame order with
    stride; dummy intrinsics (`video_dataset.py`)."""

    def __init__(self, root_dir: str, split: str = "", mode: str = "train",
                 back_context: int = 1, forward_context: int = 1,
                 strides: Sequence[int] = (1,),
                 image_shape=None, jittering=(), **kwargs):
        self.root_dir = root_dir
        self.mode = mode
        self.image_shape = tuple(image_shape) if image_shape else None
        self.jittering = tuple(jittering)
        self.backward_context = back_context
        self.forward_context = forward_context
        self.stride = strides[0] if strides else 1

        tree = scan_image_tree(root_dir)
        self.tree = {folder: sorted(names, key=frame_index)
                     for folder, names in tree.items()}
        self.samples = []  # (folder, target name, [context names...])
        for folder, names in self.tree.items():
            n = len(names)
            b, f, s = back_context, forward_context, self.stride
            for i in range(b * s, n - f * s):
                ctx = [names[i + o * s] for o in range(-b, 0)] + \
                      [names[i + o * s] for o in range(1, f + 1)]
                self.samples.append((folder, names[i], ctx))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int) -> Sample:
        folder, target, ctx = self.samples[idx]
        base = (self.root_dir if folder == self.root_dir
                else os.path.join(self.root_dir, folder))
        image = load_image_rgb(os.path.join(base, target))
        h, w = image.shape[:2]
        sample: Sample = {
            "idx": idx,
            "filename": f"{os.path.basename(folder)}_"
                        f"{os.path.splitext(target)[0]}",
            "rgb": image,
            "rgb_context": np.stack(
                [load_image_rgb(os.path.join(base, c)) for c in ctx]),
            "intrinsics": dummy_calibration(w, h),
        }
        if self.mode == "train":
            rng = sample_rng(self, folder, target)
            return train_transform(sample, self.image_shape or (),
                                   self.jittering, rng)
        return eval_transform(sample, self.image_shape or ())


class VideoRandomDataset(VideoDataset):
    """Random-stride variant (`video_random_dataset.py`): the context stride
    is resampled per item from [1, max_stride]."""

    def __init__(self, *args, max_stride: int = 3, **kwargs):
        super().__init__(*args, **kwargs)
        self.max_stride = max_stride

    def __getitem__(self, idx: int) -> Sample:
        rng = np.random.default_rng(idx)
        folder, target, _ = self.samples[idx]
        base = (self.root_dir if folder == self.root_dir
                else os.path.join(self.root_dir, folder))
        # Re-derive context with a random stride, clamped to bounds.
        names = self.tree[folder]
        i = names.index(target)
        s = int(rng.integers(1, self.max_stride + 1))
        b, f = self.backward_context, self.forward_context
        lo, hi = i - b * s, i + f * s
        if lo < 0 or hi >= len(names):
            s = 1
        ctx = [names[i + o * s] for o in range(-b, 0)] + \
              [names[i + o * s] for o in range(1, f + 1)]
        image = load_image_rgb(os.path.join(base, target))
        h, w = image.shape[:2]
        sample: Sample = {
            "idx": idx,
            "filename": f"{os.path.basename(folder)}_"
                        f"{os.path.splitext(target)[0]}",
            "rgb": image,
            "rgb_context": np.stack(
                [load_image_rgb(os.path.join(base, c)) for c in ctx]),
            "intrinsics": dummy_calibration(w, h),
        }
        if self.mode == "train":
            jr = sample_rng(self, folder, target)
            return train_transform(sample, self.image_shape or (),
                                   self.jittering, jr)
        return eval_transform(sample, self.image_shape or ())


class ImageDataset(VideoDataset):
    """Flat image folders with integer-indexed filenames
    (`image_dataset.py:41+`); same behavior as VideoDataset here since
    context is resolved by sorted frame order."""


from dro_sfm_tpu.data import register_dataset  # noqa: E402


def _video_factory(cls):
    def factory(path, split, mode, image_shape, jittering, section):
        return cls(
            root_dir=path, split=split, mode=mode,
            back_context=section.back_context,
            forward_context=section.forward_context,
            strides=tuple(section.strides),
            image_shape=image_shape,
            jittering=jittering if mode == "train" else ())
    return factory


register_dataset("Video")(_video_factory(VideoDataset))
register_dataset("Video_Random")(_video_factory(VideoRandomDataset))
register_dataset("Image")(_video_factory(ImageDataset))
