"""Input-pipeline throughput benchmark (VERDICT r2 item 7).

Fabricates a realistic on-disk ScanNet-layout fixture (full-resolution JPG
color + uint16 PNG depth + pose/intrinsic text files), then measures the
training DataLoader's steady-state frames/s at the two bench operating
points (192x640 and 320x960, batch 8) — decode + resize + jitter +
collate through the real reader and thread pool. Compare against the
measured TPU step rate (`bench.py`): the loader must sustain >= ~1.5x the
step rate to keep the chip fed.

    python tools/bench_loader.py [--frames 96] [--source-hw 480 640]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fabricate_tree(root: str, n_frames: int, src_h: int, src_w: int) -> str:
    """ScanNet-layout scene with photographic-complexity JPGs (random
    smooth gradients + noise compress like real frames, unlike constant
    images which decode unrealistically fast)."""
    import cv2

    scene = os.path.join(root, "scans", "scene0000_00")
    for sub in ("color", "depth", "pose", "intrinsic"):
        os.makedirs(os.path.join(scene, sub), exist_ok=True)
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:src_h, 0:src_w].astype(np.float32)
    for i in range(n_frames):
        base = (
            127 + 80 * np.sin(xx / (20 + i % 7) + i)
            + 40 * np.cos(yy / (15 + i % 5))
        )[..., None] + rng.normal(0, 12, (src_h, src_w, 3))
        img = np.clip(base, 0, 255).astype(np.uint8)
        cv2.imwrite(os.path.join(scene, "color", f"{i}.jpg"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 90])
        depth = (2000 + 800 * np.sin(xx / 31) * np.cos(yy / 23)
                 + rng.normal(0, 30, (src_h, src_w))).astype(np.uint16)
        cv2.imwrite(os.path.join(scene, "depth", f"{i}.png"), depth)
        pose = np.eye(4)
        pose[:3, 3] = [0.05 * i, 0, 0]
        np.savetxt(os.path.join(scene, "pose", f"{i}.txt"), pose)
    K = np.array([[577.0, 0, src_w / 2, 0], [0, 577.0, src_h / 2, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]])
    np.savetxt(os.path.join(scene, "intrinsic", "intrinsic_color.txt"), K)
    split = os.path.join(root, "split.txt")
    with open(split, "w") as f:
        for i in range(n_frames):
            f.write(f"scene0000_00/color {i}.jpg\n")
    return os.path.join(root, "scans")


def measure(ds_root: str, image_shape, batch_size: int, num_workers: int,
            epochs: int = 3):
    from dro_sfm_tpu.data.loader import DataLoader
    from dro_sfm_tpu.data.scannet import ScannetDataset

    ds = ScannetDataset(ds_root, "split.txt", mode="train",
                        back_context=1, forward_context=1, downsample=1,
                        image_shape=image_shape,
                        jittering=(0.2, 0.2, 0.2, 0.05))
    loader = DataLoader(ds, batch_size, shuffle=True,
                        num_workers=num_workers, drop_last=True)
    # Warm epoch (page cache, thread pool), then timed epochs.
    for _ in loader:
        pass
    frames = 0
    t0 = time.perf_counter()
    for e in range(epochs):
        loader.set_epoch(e + 1)
        for batch in loader:
            frames += batch["rgb"].shape[0]
    dt = time.perf_counter() - t0
    return frames / dt, len(ds)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=96)
    p.add_argument("--source-hw", type=int, nargs=2, default=(480, 640))
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--keep", default=None,
                   help="reuse/keep the fixture at this path")
    args = p.parse_args()

    tmp = args.keep or tempfile.mkdtemp(prefix="dro_loader_bench_")
    try:
        if not os.path.exists(os.path.join(tmp, "split.txt")):
            fabricate_tree(tmp, args.frames, *args.source_hw)
        root = os.path.join(tmp, "scans")
        out = {"metric": "loader_frames_per_sec",
               "source_hw": list(args.source_hw),
               "batch_size": args.batch_size,
               "num_workers": args.num_workers,
               "decoded_frames_per_sample": 3}
        for shape in ((192, 640), (320, 960)):
            fps, n = measure(root, shape, args.batch_size, args.num_workers)
            out[f"fps_{shape[0]}x{shape[1]}"] = round(fps, 2)
        print(json.dumps(out))
    finally:
        if not args.keep:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
