"""ScanNet dataset readers (train + paired test variant).

Rebuild of `/root/reference/dro_sfm/datasets/scannet_dataset.py` and
`scannet_test_dataset.py`: scene/color/depth/pose/intrinsic directory
layout, mm->m png depth with invalid->-1, ::5 frame downsampling, relative
poses ``inv(ctx_pose) @ pose``, split-file driven.
"""
from __future__ import annotations

import os
from collections import defaultdict
from typing import Optional, Sequence

import cv2
import numpy as np

from dro_sfm_tpu.data.base import Sample, sample_rng
from dro_sfm_tpu.data.kitti import (
    invert_pose_numpy,
    load_image_rgb,
    read_matrix_txt,
)
from dro_sfm_tpu.data.transforms import eval_transform, train_transform


def read_png_depth_mm(path: str) -> np.ndarray:
    """uint16 png in millimetres -> metres; invalid (0) -> -1
    (`scannet_dataset.py:47-58`)."""
    depth_png = cv2.imread(path, cv2.IMREAD_ANYDEPTH)
    assert depth_png is not None, path
    depth = depth_png.astype(np.float32) / 1000.0
    depth[depth_png == 0] = -1.0
    return depth[..., None]


class ScannetDataset:
    """ScanNet train/val reader (`scannet_dataset.py:68-229`)."""

    def __init__(self, root_dir: str, split: str, mode: str = "train",
                 depth_type: Optional[str] = "groundtruth",
                 back_context: int = 0, forward_context: int = 0,
                 strides: Sequence[int] = (1,), downsample: int = 5,
                 image_shape=None, jittering=()):
        assert len(strides) == 1 and strides[0] == 1, \
            "ScannetDataset only supports stride 1"
        self.root_dir = root_dir
        self.mode = mode
        self.with_depth = bool(depth_type)
        self.image_shape = tuple(image_shape) if image_shape else None
        self.jittering = tuple(jittering)
        self.backward_context = back_context
        self.forward_context = forward_context

        # Split file lives next to the data root (`scannet_dataset.py:118`).
        split_path = (split if os.path.isabs(split)
                      else os.path.join(os.path.dirname(root_dir), split))
        self.file_tree = defaultdict(list)
        with open(split_path) as f:
            for line in f:
                if line.strip():
                    scene, filename = line.split()
                    self.file_tree[scene].append(filename)
        # ::5 temporal downsample (`scannet_dataset.py:124-126`).
        for k in self.file_tree:
            self.file_tree[k] = self.file_tree[k][::downsample]

        self.files = []
        for scene, names in self.file_tree.items():
            for fname in names:
                if self._has_context(fname, names):
                    self.files.append((scene, fname))

    # ------------------------------------------------------------------
    def _context_names(self, filename: str, file_list):
        fidx = file_list.index(filename)
        offsets = list(range(-self.backward_context, 0)) + \
            list(range(1, self.forward_context + 1))
        return [file_list[fidx + o] if 0 <= fidx + o < len(file_list)
                else None for o in offsets]

    def _has_context(self, filename, file_list):
        return all(c is not None and c in file_list
                   for c in self._context_names(filename, file_list))

    def _sample_context(self, idx: int, scene: str, filename: str):
        """Context frame names for sample ``idx`` (overridden by the paired
        test variant)."""
        return self._context_names(filename, self.file_tree[scene])

    def _pose(self, scene: str, filename: str) -> np.ndarray:
        path = os.path.join(self.root_dir, scene, filename)
        path = path.replace("color", "pose")
        path = os.path.splitext(path)[0] + ".txt"
        return read_matrix_txt(path)

    def _intrinsics(self, path: str) -> np.ndarray:
        """Per-scene intrinsics, parsed once (every sample of a scene reads
        the same file; np.genfromtxt costs ~1 ms per call)."""
        cache = getattr(self, "_intr_cache", None)
        if cache is None:
            cache = self._intr_cache = {}
        intr = cache.get(path)
        if intr is None:
            intr = read_matrix_txt(path)[:3, :3].astype(np.float32)
            cache[path] = intr
        return intr.copy()

    # ------------------------------------------------------------------
    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx: int) -> Sample:
        scene, filename = self.files[idx]
        img_path = os.path.join(self.root_dir, scene, filename)
        image = load_image_rgb(img_path)

        intr_path = img_path.split("color")[0] + "intrinsic/intrinsic_color.txt"
        intr = self._intrinsics(intr_path)

        ctx_names = self._sample_context(idx, scene, filename)
        ctx_imgs = [load_image_rgb(os.path.join(self.root_dir, scene, c))
                    for c in ctx_names]
        pose = self._pose(scene, filename)
        rel_poses = [
            (invert_pose_numpy(self._pose(scene, c)) @ pose).astype(np.float32)
            for c in ctx_names]

        sample: Sample = {
            "idx": idx,
            "filename": "%s_%s" % (scene.split("/")[0],
                                   os.path.splitext(filename)[0]),
            "rgb": image,
            "intrinsics": intr,
            "rgb_context": np.stack(ctx_imgs),
            "pose_context": np.stack(rel_poses),
        }
        if self.with_depth:
            depth_path = img_path.replace("color", "depth")
            depth_path = os.path.splitext(depth_path)[0] + ".png"
            depth = read_png_depth_mm(depth_path)
            # Depth is resized to the image size with nearest interpolation
            # (`scannet_dataset.py:190`).
            if depth.shape[:2] != image.shape[:2]:
                depth = cv2.resize(depth[..., 0],
                                   (image.shape[1], image.shape[0]),
                                   interpolation=cv2.INTER_NEAREST)[..., None]
            sample["depth"] = depth

        if self.mode == "train":
            rng = sample_rng(self, scene, filename)
            return train_transform(sample, self.image_shape or (),
                                   self.jittering, rng)
        return eval_transform(sample, self.image_shape or ())


class ScannetTestDataset(ScannetDataset):
    """Paired test split: explicit (target, context...) tuples per line
    (`scannet_test_dataset.py:67-253`). Each split line lists the target
    frame followed by its context frames, all scene-relative."""

    def __init__(self, root_dir: str, split: str, mode: str = "test",
                 depth_type: Optional[str] = "groundtruth",
                 back_context: int = 0, forward_context: int = 0,
                 image_shape=None, jittering=(), **kwargs):
        # Bypass parent context scanning: read explicit tuples.
        self.root_dir = root_dir
        self.mode = mode
        self.with_depth = bool(depth_type)
        self.image_shape = tuple(image_shape) if image_shape else None
        self.jittering = tuple(jittering)
        self.backward_context = back_context
        self.forward_context = forward_context

        split_path = (split if os.path.isabs(split)
                      else os.path.join(os.path.dirname(root_dir), split))
        self.tuples = []
        with open(split_path) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 3:
                    self.tuples.append((parts[0], parts[1], parts[2:]))
        self.file_tree = defaultdict(list)
        self.files = [(scene, target) for scene, target, _ in self.tuples]

    def _sample_context(self, idx: int, scene: str, filename: str):
        return list(self.tuples[idx][2])


from dro_sfm_tpu.data import register_dataset  # noqa: E402


@register_dataset("Scannet")
def _scannet_factory(path, split, mode, image_shape, jittering, section):
    return ScannetDataset(
        root_dir=path, split=split, mode=mode,
        depth_type=(section.depth_type[0] if section.depth_type else None),
        back_context=section.back_context,
        forward_context=section.forward_context,
        strides=tuple(section.strides),
        image_shape=image_shape,
        jittering=jittering if mode == "train" else ())


@register_dataset("ScannetTest")
def _scannet_test_factory(path, split, mode, image_shape, jittering, section):
    return ScannetTestDataset(
        root_dir=path, split=split, mode=mode,
        depth_type=(section.depth_type[0] if section.depth_type else None),
        back_context=section.back_context,
        forward_context=section.forward_context,
        image_shape=image_shape,
        jittering=())
