"""Multi-frame DeMoN variant (2- or 3-view folders).

Rebuild of `/root/reference/dro_sfm/datasets/demon_mf_dataset.py:28-180`:
when a folder provides `0002.jpg`/`0002.npy`, the middle frame (0001)
becomes the target with (0000, 0002) as context; otherwise falls back to
two-view (target 0000, context 0001, duplicated when a 3-view batch shape
is required).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from dro_sfm_tpu.data.base import Sample, sample_rng
from dro_sfm_tpu.data.kitti import load_image_rgb
from dro_sfm_tpu.data.transforms import eval_transform, train_transform


def _load_poses(folder: str) -> np.ndarray:
    """poses.txt rows (world->cam 3x4) -> [V,4,4]."""
    rows = np.genfromtxt(os.path.join(folder, "poses.txt")).astype(np.float64)
    rows = np.atleast_2d(rows)
    out = []
    for r in rows:
        T = np.eye(4)
        T[:3, :] = r.reshape(3, 4)
        out.append(T)
    return np.stack(out)


class DemonMFDataset:
    def __init__(self, root_dir: str, split: str, mode: str = "train",
                 depth_type: Optional[str] = "groundtruth",
                 back_context: int = 1, forward_context: int = 1,
                 image_shape=None, jittering=(), **kwargs):
        self.root_dir = root_dir
        self.mode = mode
        self.with_depth = bool(depth_type)
        self.image_shape = tuple(image_shape) if image_shape else None
        self.jittering = tuple(jittering)
        self.three_view = back_context == 1 and forward_context == 1

        split_path = (split if os.path.isabs(split)
                      else os.path.join(root_dir, split))
        self.paths = []
        with open(split_path) as f:
            for line in f:
                if not line.strip():
                    continue
                folder = os.path.join(root_dir, line.split()[0])
                has3 = (os.path.exists(os.path.join(folder, "0002.jpg"))
                        and os.path.exists(os.path.join(folder, "0002.npy")))
                if self.three_view:
                    if has3:
                        self.paths.append((folder, True))
                else:
                    self.paths.append((folder, has3))

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx: int) -> Sample:
        folder, has3 = self.paths[idx]
        poses = _load_poses(folder)
        if self.three_view and has3:
            # Middle frame target, (0000, 0002) context
            # (`demon_mf_dataset.py` _get_view3).
            image = load_image_rgb(os.path.join(folder, "0001.jpg"))
            depth = np.load(os.path.join(folder, "0001.npy")).astype(np.float32)
            ctx = np.stack([load_image_rgb(os.path.join(folder, "0000.jpg")),
                            load_image_rgb(os.path.join(folder, "0002.jpg"))])
            rel = np.stack([
                (poses[0] @ np.linalg.inv(poses[1])).astype(np.float32),
                (poses[2] @ np.linalg.inv(poses[1])).astype(np.float32)])
        else:
            image = load_image_rgb(os.path.join(folder, "0000.jpg"))
            depth = np.load(os.path.join(folder, "0000.npy")).astype(np.float32)
            c1 = load_image_rgb(os.path.join(folder, "0001.jpg"))
            rel01 = (poses[1] @ np.linalg.inv(poses[0])).astype(np.float32)
            ctx = np.stack([c1])
            rel = rel01[None]

        sample: Sample = {
            "idx": idx,
            "filename": os.path.basename(folder),
            "rgb": image,
            "rgb_context": ctx,
            "intrinsics": np.genfromtxt(
                os.path.join(folder, "cam.txt")).astype(np.float32),
            "pose_context": rel,
        }
        if self.with_depth:
            sample["depth"] = depth[..., None] if depth.ndim == 2 else depth
        if self.mode == "train":
            rng = sample_rng(self, folder)
            return train_transform(sample, self.image_shape or (),
                                   self.jittering, rng)
        return eval_transform(sample, self.image_shape or ())


from dro_sfm_tpu.data import register_dataset  # noqa: E402


@register_dataset("DemonMF")
def _demon_mf_factory(path, split, mode, image_shape, jittering, section):
    return DemonMFDataset(
        root_dir=path, split=split, mode=mode,
        depth_type=(section.depth_type[0] if section.depth_type else None),
        back_context=section.back_context,
        forward_context=section.forward_context,
        image_shape=image_shape,
        jittering=jittering if mode == "train" else ())
