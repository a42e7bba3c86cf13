"""One-command model-zoo parity pipeline: reference .ckpt -> metric table.

Takes one of the reference's published torch checkpoints
(`/root/reference/README.md:163-183`), converts it onto the flax tree
(`tools/convert_torch_weights.py`), evaluates at the checkpoint's embedded
operating point (network version, depth range, crop, eval image shape —
`/root/reference/scripts/eval.py:33-67` semantics), and prints the
predicted metrics side by side with the README model-zoo row for that
checkpoint. The day real data + checkpoints are present, reference parity
is this single command:

    python tools/eval_reference_ckpt.py outdoor_kitti.ckpt \
        --dataset KITTI --path /data/kitti --split splits/eigen_test.txt \
        --depth-type velodyne

Any dataset name from the registry works; the eval dataset section is the
only thing not carried from the checkpoint (paths are machine-specific).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# README model-zoo rows (`/root/reference/README.md:177-183`, BASELINE.md).
# Keyed by published checkpoint filename; None = not reported.
README_TABLE = {
    "outdoor_kitti.ckpt": {
        "abs_rel": 0.045, "sq_rel": 0.193, "rmse": 2.570, "rmse_log": 0.080,
        "a1": 0.971, "a2": 0.994, "a3": 0.998, "SILog": 0.079,
        "l1_inv": 0.003, "rot_ang": None, "t_ang": None, "t_cm": None},
    "outdoor_kitti_selfsup.ckpt": {
        "abs_rel": 0.053, "sq_rel": 0.346, "rmse": 3.037, "rmse_log": 0.102,
        "a1": 0.962, "a2": 0.990, "a3": 0.996, "SILog": 0.101,
        "l1_inv": 0.004, "rot_ang": None, "t_ang": None, "t_cm": None},
    "indoor_scannet.ckpt": {
        "abs_rel": 0.053, "sq_rel": 0.017, "rmse": 0.165, "rmse_log": 0.080,
        "a1": 0.967, "a2": 0.994, "a3": 0.998, "SILog": 0.078,
        "l1_inv": 0.033, "rot_ang": 0.472, "t_ang": 9.297, "t_cm": 1.160},
    "indoor_scannet_view5.ckpt": {
        "abs_rel": 0.047, "sq_rel": 0.014, "rmse": 0.151, "rmse_log": 0.072,
        "a1": 0.976, "a2": 0.996, "a3": 0.999, "SILog": 0.071,
        "l1_inv": 0.030, "rot_ang": 0.456, "t_ang": 8.502, "t_cm": 1.163},
    "indoor_scannet_selfsup.ckpt": {
        "abs_rel": 0.143, "sq_rel": 0.345, "rmse": 0.656, "rmse_log": 0.274,
        "a1": 0.896, "a2": 0.954, "a3": 0.969, "SILog": 0.272,
        "l1_inv": 0.106, "rot_ang": 0.609, "t_ang": 10.779, "t_cm": 1.393},
}


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="reference checkpoint -> converted eval -> README "
                    "side-by-side")
    p.add_argument("checkpoint", help="reference torch .ckpt")
    p.add_argument("--dataset", required=True,
                   help="eval dataset registry name (KITTI, ScannetTest, ...)")
    p.add_argument("--path", required=True, help="dataset root directory")
    p.add_argument("--split", required=True, help="split file")
    p.add_argument("--depth-type", default="groundtruth")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--back-context", type=int, default=1)
    p.add_argument("--forward-context", type=int, default=1)
    p.add_argument("--out", default=None,
                   help="where to write the converted framework ckpt "
                        "(default: alongside the input)")
    p.add_argument("--expect", default=None,
                   help="README row to compare against (default: the "
                        "checkpoint's filename)")
    p.add_argument("--mode", default="pp_gt",
                   choices=["raw", "pp", "gt", "pp_gt"],
                   help="metric mode for the comparison row (README zoo "
                        "numbers are post-processed + GT-median-scaled)")
    return p.parse_args(argv)


def convert(ref_ckpt: str, out_ckpt: str) -> None:
    """torch reference ckpt -> eval-ready framework ckpt (config carried)."""
    import torch

    from tools.convert_torch_weights import (
        convert_dro_checkpoint, emit_framework_ckpt)

    raw = torch.load(ref_ckpt, map_location="cpu")
    state_dict = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
    state_dict = {k: v.numpy() if hasattr(v, "numpy") else v
                  for k, v in state_dict.items()}
    tree = convert_dro_checkpoint(state_dict)
    ref_cfg = raw.get("config", {}) if isinstance(raw, dict) else {}
    if hasattr(ref_cfg, "items") and not isinstance(ref_cfg, dict):
        ref_cfg = dict(ref_cfg)
    epoch = int(raw.get("epoch", 0)) if isinstance(raw, dict) else 0
    emit_framework_ckpt(tree, out_ckpt, ref_cfg, epoch=epoch)


def print_comparison(metrics: dict, readme_row, mode: str) -> dict:
    """Side-by-side table: our metrics (4 modes) vs the README row."""
    from dro_sfm_tpu.training.metrics import ALL_METRIC_NAMES

    suffix = "" if mode == "raw" else f"_{mode}"
    rows = []
    for m in ("", "_pp", "_gt", "_pp_gt"):
        label = "depth" + m
        rows.append((label, [metrics.get(f"{k}{m}") for k in
                             ALL_METRIC_NAMES]))
    header = ["METRIC"] + list(ALL_METRIC_NAMES)
    widths = [max(10, len(h) + 2) for h in header]

    def fmt_row(label, values):
        cells = [f"{label:<{widths[0]}}"]
        for v, w in zip(values, widths[1:]):
            cells.append(f"{'-' if v is None else f'{v:.3f}':>{w}}")
        return "| " + " | ".join(cells) + " |"

    print("|" + "-" * (sum(widths) + 3 * len(widths) + 1) + "|")
    print(fmt_row(header[0], []) if False else
          "| " + " | ".join(f"{h:>{w}}" if i else f"{h:<{w}}"
                            for i, (h, w) in enumerate(zip(header, widths)))
          + " |")
    for label, vals in rows:
        print(fmt_row(label, vals))
    delta = {}
    if readme_row:
        print(fmt_row("README", [readme_row.get(k) for k in
                                 ALL_METRIC_NAMES]))
        ours = {k: metrics.get(f"{k}{suffix}") for k in ALL_METRIC_NAMES}
        delta = {k: (ours[k] - readme_row[k])
                 for k in ALL_METRIC_NAMES
                 if readme_row.get(k) is not None and ours[k] is not None}
        print(fmt_row(f"delta ({mode})",
                      [delta.get(k) for k in ALL_METRIC_NAMES]))
    print("|" + "-" * (sum(widths) + 3 * len(widths) + 1) + "|")
    return delta


def main(argv=None):
    from dro_sfm_tpu.utils.misc import apply_platform_env
    apply_platform_env()
    args = parse_args(argv)

    out_ckpt = args.out or (os.path.splitext(args.checkpoint)[0]
                            + ".converted.ckpt")
    convert(args.checkpoint, out_ckpt)
    print(f"converted -> {out_ckpt}")

    from dro_sfm_tpu.training.trainer import Trainer
    from dro_sfm_tpu.utils.config import ConfigNode, prepare_config

    with open(out_ckpt + ".json") as f:
        cfg_dict = json.load(f)["config"]
    # Operating point (version/crop/depth range/image shape) comes from the
    # checkpoint; the eval dataset location comes from the command line.
    for section, extras in (("test", {}), ("validation", {})):
        cfg_dict["datasets"][section] = {
            **cfg_dict["datasets"].get(section, {}),
            "dataset": [args.dataset], "path": [args.path],
            "split": [args.split], "depth_type": [args.depth_type],
            "batch_size": args.batch_size,
            "back_context": args.back_context,
            "forward_context": args.forward_context,
            **extras,
        }
    cfg_dict["datasets"]["train"]["dataset"] = []
    cfg_dict["prepared"] = False
    cfg = prepare_config(ConfigNode(cfg_dict))

    trainer = Trainer(cfg, resume=out_ckpt)
    metrics = trainer.test()

    key = args.expect or os.path.basename(args.checkpoint)
    readme_row = README_TABLE.get(key)
    if readme_row is None:
        print(f"(no README model-zoo row named {key!r}; known: "
              f"{sorted(README_TABLE)})")
    delta = print_comparison(metrics, readme_row, args.mode)
    print(json.dumps({"metrics": {k: float(v) for k, v in metrics.items()},
                      "readme_row": readme_row,
                      "delta": delta}))


if __name__ == "__main__":
    main()
