"""Export a trained checkpoint as a self-contained serving artifact.

    python scripts/export.py --checkpoint <ckpt> --output <dir>
        [--batch 1] [--image-shape H W] [--views 2] [--platforms cpu tpu]

Writes <dir>/model.stablehlo (weights baked in; loadable with
`dro_sfm_tpu.export_serving.load_serving_artifact` — no config or model
code needed on the serving side) and <dir>/meta.json, then verifies the
artifact reproduces the live model on random inputs.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from dro_sfm_tpu.utils.misc import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--views", type=int, default=2)
    p.add_argument("--image-shape", type=int, nargs=2, default=None)
    p.add_argument("--platforms", nargs="+", default=["cpu", "tpu"])
    p.add_argument("--dynamic-batch", action="store_true",
                   help="export with a symbolic batch dimension (one "
                        "artifact serves any batch size)")
    p.add_argument("--skip-check", action="store_true",
                   help="skip the live-vs-frozen roundtrip check")
    args = p.parse_args()

    from dro_sfm_tpu.export_serving import (
        export_serving_artifact, serving_roundtrip_check)
    from dro_sfm_tpu.inference import load_model

    net, variables, cfg = load_model(args.checkpoint)
    shape = tuple(args.image_shape or cfg.datasets.augmentation.image_shape)
    path = export_serving_artifact(
        net, variables, args.output, args.batch, args.views, shape,
        platforms=tuple(args.platforms), dynamic_batch=args.dynamic_batch,
        meta_extra={"checkpoint": os.path.abspath(args.checkpoint),
                    "version": cfg.model.depth_net.version,
                    "min_depth": cfg.model.params.min_depth,
                    "max_depth": cfg.model.params.max_depth})
    size_mb = os.path.getsize(path) / 1e6
    print(f"exported {path} ({size_mb:.1f} MB, platforms={args.platforms})")
    if not args.skip_check:
        err = serving_roundtrip_check(net, variables, args.output,
                                      args.batch, args.views, shape)
        print(f"roundtrip check OK (max |depth delta| {err:.2e})")


if __name__ == "__main__":
    main()
