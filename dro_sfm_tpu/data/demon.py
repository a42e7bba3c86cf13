"""DeMoN-format two-view dataset (sun3d / rgbd / scenes11 mixtures).

Rebuild of `/root/reference/dro_sfm/datasets/demon_dataset.py:27-107`:
each sample is a folder with `0000.jpg` / `0001.jpg` / `0000.npy` (depth) /
`poses.txt` (two 3x4 world->cam rows) / `cam.txt` (3x3 intrinsics); the
relative pose is ``pose1 @ inv(pose0)``.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from dro_sfm_tpu.data.base import Sample, sample_rng
from dro_sfm_tpu.data.kitti import load_image_rgb
from dro_sfm_tpu.data.transforms import eval_transform, train_transform


class DemonDataset:
    def __init__(self, root_dir: str, split: str, mode: str = "train",
                 depth_type: Optional[str] = "groundtruth",
                 image_shape=None, jittering=(), **kwargs):
        self.root_dir = root_dir
        self.mode = mode
        self.with_depth = bool(depth_type)
        self.image_shape = tuple(image_shape) if image_shape else None
        self.jittering = tuple(jittering)
        split_path = (split if os.path.isabs(split)
                      else os.path.join(root_dir, split))
        with open(split_path) as f:
            self.paths = [os.path.join(root_dir, line.split()[0])
                          for line in f if line.strip()]

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx: int) -> Sample:
        folder = self.paths[idx]
        image = load_image_rgb(os.path.join(folder, "0000.jpg"))
        ctx = load_image_rgb(os.path.join(folder, "0001.jpg"))

        poses = np.genfromtxt(os.path.join(folder, "poses.txt")).astype(np.float64)
        p0 = np.eye(4)
        p1 = np.eye(4)
        p0[:3, :] = poses[0].reshape(3, 4)
        p1[:3, :] = poses[1].reshape(3, 4)
        # poses.txt rows are world->camera; relative target->context is
        # pose1 @ inv(pose0) (`demon_dataset.py:75-84`).
        rel = (p1 @ np.linalg.inv(p0)).astype(np.float32)

        intr = np.genfromtxt(os.path.join(folder, "cam.txt")).astype(np.float32)

        sample: Sample = {
            "idx": idx,
            "filename": os.path.basename(folder),
            "rgb": image,
            "rgb_context": ctx[None],
            "intrinsics": intr,
            "pose_context": rel[None],
        }
        if self.with_depth:
            depth = np.load(os.path.join(folder, "0000.npy")).astype(np.float32)
            sample["depth"] = depth[..., None] if depth.ndim == 2 else depth

        if self.mode == "train":
            rng = sample_rng(self, folder)
            return train_transform(sample, self.image_shape or (),
                                   self.jittering, rng)
        return eval_transform(sample, self.image_shape or ())


from dro_sfm_tpu.data import register_dataset  # noqa: E402


@register_dataset("Demon")
def _demon_factory(path, split, mode, image_shape, jittering, section):
    return DemonDataset(
        root_dir=path, split=split, mode=mode,
        depth_type=(section.depth_type[0] if section.depth_type else None),
        image_shape=image_shape,
        jittering=jittering if mode == "train" else ())
