"""NYU-v2 (processed h5) dataset reader.

Rebuild of `/root/reference/dro_sfm/datasets/nyu_dataset_processed.py` and
`nyu_dataset_test_processed.py`: directories of `.h5` files each holding
`rgb` [3,H,W] uint8 and `depth` [H,W] float; context frames by sorted order
within a session; dummy intrinsics (518.86, cx 325.6, cy 253.7 — the
standard NYU calibration used by the processed dumps).
"""
from __future__ import annotations

import os
from collections import defaultdict
from typing import Optional

import numpy as np

from dro_sfm_tpu.data.base import Sample, sample_rng
from dro_sfm_tpu.data.transforms import eval_transform, train_transform

NYU_K = np.array([[518.85790117450188, 0.0, 325.58244941119034],
                  [0.0, 519.46961112127485, 253.73616633400465],
                  [0.0, 0.0, 1.0]], dtype=np.float32)


def scan_h5_tree(root_dir: str) -> dict:
    tree = defaultdict(list)
    for entry in sorted(os.scandir(root_dir), key=lambda e: e.name):
        rel = os.path.relpath(entry.path, root_dir)
        if entry.is_dir():
            sub = scan_h5_tree(entry.path)
            if sub.get(entry.path):
                tree[rel] = sub[entry.path]
        elif entry.name.lower().endswith(".h5"):
            tree[root_dir].append(rel)
    return tree


def read_h5_sample(path: str):
    import h5py
    with h5py.File(path, "r") as f:
        rgb = np.array(f["rgb"])                   # [3,H,W] uint8
        depth = np.array(f["depth"])               # [H,W] float
    image = np.transpose(rgb, (1, 2, 0)).astype(np.float32) / 255.0
    return image, depth.astype(np.float32)[..., None]


class NYUDataset:
    def __init__(self, root_dir: str, split: str = "", mode: str = "train",
                 depth_type: Optional[str] = "groundtruth",
                 back_context: int = 0, forward_context: int = 0,
                 image_shape=None, jittering=(), **kwargs):
        self.root_dir = root_dir
        self.mode = mode
        self.with_depth = bool(depth_type)
        self.image_shape = tuple(image_shape) if image_shape else None
        self.jittering = tuple(jittering)
        self.backward_context = back_context
        self.forward_context = forward_context

        self.tree = {k: sorted(v) for k, v in scan_h5_tree(root_dir).items()}
        self.files = []
        for session, names in self.tree.items():
            b, f = back_context, forward_context
            for i in range(b, len(names) - f):
                self.files.append((session, i))

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx: int) -> Sample:
        session, i = self.files[idx]
        names = self.tree[session]
        base = (self.root_dir if session == self.root_dir
                else os.path.join(self.root_dir, session))
        image, depth = read_h5_sample(os.path.join(base, names[i]))
        b, f = self.backward_context, self.forward_context
        ctx_names = names[i - b:i] + names[i + 1:i + 1 + f]
        ctx = [read_h5_sample(os.path.join(base, c))[0] for c in ctx_names]

        sample: Sample = {
            "idx": idx,
            "filename": "%s_%s" % (os.path.basename(session),
                                   os.path.splitext(names[i])[0]),
            "rgb": image,
            "rgb_context": np.stack(ctx) if ctx else
                np.zeros((0, *image.shape), np.float32),
            "intrinsics": NYU_K.copy(),
        }
        if self.with_depth:
            sample["depth"] = depth

        if self.mode == "train":
            rng = sample_rng(self, session, i)
            return train_transform(sample, self.image_shape or (),
                                   self.jittering, rng)
        return eval_transform(sample, self.image_shape or ())


from dro_sfm_tpu.data import register_dataset  # noqa: E402


def _nyu_factory(path, split, mode, image_shape, jittering, section):
    return NYUDataset(
        root_dir=path, split=split, mode=mode,
        depth_type=(section.depth_type[0] if section.depth_type else None),
        back_context=section.back_context,
        forward_context=section.forward_context,
        image_shape=image_shape,
        jittering=jittering if mode == "train" else ())


register_dataset("NYU")(_nyu_factory)
register_dataset("NYUtest")(_nyu_factory)
