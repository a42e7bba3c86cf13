"""Training CLI.

Equivalent of `/root/reference/scripts/train.py`: takes a .yaml config or a
.ckpt to resume, builds the trainer, runs fit().

Usage:
    python scripts/train.py configs/overfit_synthetic.yaml
    python scripts/train.py results/model/epoch=03_abs_rel=0.123.ckpt
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    parser = argparse.ArgumentParser(description="dro-sfm-tpu training")
    parser.add_argument("file", help="Input file (.yaml config or .ckpt)")
    parser.add_argument("--seed", type=int, default=None,
                        help="Override random seed")
    parser.add_argument("--profile", default=None, metavar="LOGDIR",
                        help="Capture a jax.profiler device trace of the "
                             "first training steps into LOGDIR")
    return parser.parse_args()


def main():
    from dro_sfm_tpu.utils.misc import apply_platform_env
    apply_platform_env()
    args = parse_args()
    from dro_sfm_tpu.training.trainer import Trainer
    from dro_sfm_tpu.utils.config import load_config, prepare_config, ConfigNode

    resume = None
    if args.file.endswith(".ckpt"):
        # Resume: config comes from the checkpoint sidecar
        # (`utils/config.py:237-248` parity).
        with open(args.file + ".json") as f:
            meta = json.load(f)
        cfg = ConfigNode(meta["config"])
        cfg = prepare_config(cfg)
        resume = args.file
    else:
        cfg = load_config(args.file)
    if args.seed is not None:
        cfg.arch.seed = args.seed

    trainer = Trainer(cfg, resume=resume)
    if args.profile:
        from dro_sfm_tpu.utils.profiler import trace
        with trace(args.profile):
            metrics = trainer.fit()
    else:
        metrics = trainer.fit()
    print(json.dumps({k: float(v) for k, v in metrics.items()}, indent=2))


if __name__ == "__main__":
    main()
