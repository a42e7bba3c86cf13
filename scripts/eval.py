"""Evaluation CLI.

Equivalent of `/root/reference/scripts/eval.py`: load a checkpoint (and its
embedded config), run the test loop, print the metric table.

Usage:
    python scripts/eval.py --checkpoint model.ckpt [--config override.yaml]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    parser = argparse.ArgumentParser(description="dro-sfm-tpu evaluation")
    parser.add_argument("--checkpoint", required=True, help=".ckpt file")
    parser.add_argument("--config", default=None,
                        help="Optional .yaml overriding the ckpt config")
    parser.add_argument("--half", action="store_true",
                        help="half-precision evaluation (bfloat16 network, "
                             "fp32 geometry) — the TPU equivalent of the "
                             "reference's fp16 `--half` mode "
                             "(ref scripts/eval.py:33-67)")
    return parser.parse_args()


def main():
    from dro_sfm_tpu.utils.misc import apply_platform_env
    apply_platform_env()
    args = parse_args()
    from dro_sfm_tpu.training.trainer import Trainer
    from dro_sfm_tpu.utils.config import ConfigNode, load_config, prepare_config

    if args.config:
        cfg = load_config(args.config)
    else:
        with open(args.checkpoint + ".json") as f:
            meta = json.load(f)
        cfg = prepare_config(ConfigNode(meta["config"]))

    if args.half:
        cfg.model.depth_net.mixed_precision = True

    trainer = Trainer(cfg, resume=args.checkpoint)
    if trainer.test_datasets is not None:
        metrics = trainer.test(save_artifacts=True)
    else:
        metrics = trainer.validate()
    print(json.dumps({k: float(v) for k, v in metrics.items()}, indent=2))


if __name__ == "__main__":
    main()
