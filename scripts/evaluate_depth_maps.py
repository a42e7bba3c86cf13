"""Standalone depth-map evaluation CLI (no model needed).

Equivalent of `/root/reference/scripts/evaluate_depth_maps.py:40-66`:
compare a folder of predicted depth maps against a folder of ground-truth
maps and print the 9-metric vector — a fixture-free oracle for the metrics
module.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="folder-vs-folder depth metrics")
    p.add_argument("--pred", required=True, help="predicted depth folder")
    p.add_argument("--gt", required=True, help="ground-truth depth folder")
    p.add_argument("--crop", default="", choices=["", "garg", "eigen_nyu"])
    p.add_argument("--min-depth", type=float, default=0.2)
    p.add_argument("--max-depth", type=float, default=80.0)
    p.add_argument("--use-gt-scale", action="store_true")
    return p.parse_args()


def main():
    from dro_sfm_tpu.utils.misc import apply_platform_env
    apply_platform_env()
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dro_sfm_tpu.training.metrics import (
        DEPTH_METRIC_NAMES,
        MetricsConfig,
        compute_depth_metrics,
    )
    from dro_sfm_tpu.utils.depth import load_depth

    exts = (".npz", ".png")
    pred_files = sorted(f for f in os.listdir(args.pred) if f.endswith(exts))
    gt_files = sorted(f for f in os.listdir(args.gt) if f.endswith(exts))
    assert len(pred_files) == len(gt_files), \
        f"{len(pred_files)} pred vs {len(gt_files)} gt files"

    cfg = MetricsConfig(crop=args.crop, min_depth=args.min_depth,
                        max_depth=args.max_depth)
    total = np.zeros(len(DEPTH_METRIC_NAMES))
    for pf, gf in zip(pred_files, gt_files):
        pred = load_depth(os.path.join(args.pred, pf))
        gt = load_depth(os.path.join(args.gt, gf))
        m = compute_depth_metrics(
            jnp.asarray(gt)[None, ..., None], jnp.asarray(pred)[None, ..., None],
            cfg, use_gt_scale=args.use_gt_scale)
        total += np.asarray(m)
    total /= len(pred_files)
    for name, value in zip(DEPTH_METRIC_NAMES, total):
        print(f"{name:>10}: {value:.4f}")


if __name__ == "__main__":
    main()
