"""Test-time artifact dumps: depth maps, RGB, visualizations.

Rebuild of `/root/reference/dro_sfm/utils/save.py:10-65` (`save_depth`):
per-sample npz/png depth, rgb and colormap dumps controlled by
`config.save.depth.{rgb,viz,npz,png}` flags.
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np

from dro_sfm_tpu.utils.depth import viz_inv_depth, write_depth


def save_depth(batch: Dict, output: Dict, save_cfg, prefix: str = "") -> None:
    """Save per-sample artifacts of an eval batch.

    batch: collated numpy batch (needs ``filename``, ``rgb``,
    ``intrinsics``); output: eval-step output (``inv_depth_pp`` [B,H,W,1]).
    """
    folder = save_cfg.folder
    flags = save_cfg.depth
    if not (flags.rgb or flags.viz or flags.npz or flags.png):
        return
    os.makedirs(folder, exist_ok=True)

    inv_depths = np.asarray(output["inv_depth_pp"])
    depths = np.where(inv_depths > 0, 1.0 / np.maximum(inv_depths, 1e-6), 0.0)
    rgbs = np.asarray(batch["rgb"])
    valid = batch.get("valid")
    for i, filename in enumerate(batch["filename"]):
        if valid is not None and not valid[i]:
            continue
        name = filename.replace("/", "_")
        if prefix:
            name = f"{prefix}_{name}"
        base = os.path.join(folder, name)
        if flags.npz:
            write_depth(base + "_depth.npz", depths[i],
                        intrinsics=np.asarray(batch["intrinsics"][i]))
        if flags.png:
            write_depth(base + "_depth.png", depths[i])
        if flags.rgb:
            import cv2
            cv2.imwrite(base + "_rgb.png",
                        (rgbs[i][..., ::-1] * 255).astype(np.uint8))
        if flags.viz:
            import cv2
            viz = viz_inv_depth(inv_depths[i])
            cv2.imwrite(base + "_viz.png",
                        (viz[..., ::-1] * 255).astype(np.uint8))
