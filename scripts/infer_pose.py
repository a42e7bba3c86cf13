"""Sliding-window pose inference CLI.

Equivalent of `/root/reference/scripts/infer_pose.py`: run 3-frame windows
over a frame folder, chain relative poses into a global trajectory, and dump
it to json (+ optional plot).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMG_EXT = (".png", ".jpg", ".jpeg", ".bmp")


def parse_args():
    p = argparse.ArgumentParser(description="dro-sfm-tpu pose inference")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--input", required=True, help="frame folder")
    p.add_argument("--output", required=True, help="output json path")
    p.add_argument("--plot", default=None, help="optional trajectory png")
    p.add_argument("--image-shape", type=int, nargs=2, default=None)
    p.add_argument("--sample-rate", type=int, default=1)
    return p.parse_args()


def main():
    from dro_sfm_tpu.utils.misc import apply_platform_env
    apply_platform_env()
    args = parse_args()
    import cv2
    import numpy as np
    import jax.numpy as jnp

    from dro_sfm_tpu.data.video import dummy_calibration
    from dro_sfm_tpu.inference import (
        TrajectoryAccumulator,
        load_model,
        make_infer_fn,
    )

    net, variables, cfg = load_model(args.checkpoint)
    infer = make_infer_fn(net)
    shape = tuple(args.image_shape or cfg.datasets.augmentation.image_shape)

    files = sorted(f for f in os.listdir(args.input)
                   if f.lower().endswith(IMG_EXT))
    files = [os.path.join(args.input, f) for f in files][::args.sample_rate]
    assert len(files) > 2, "need at least 3 frames"

    def load(f):
        img = cv2.imread(f, cv2.IMREAD_COLOR)[..., ::-1]
        img = cv2.resize(img, (shape[1], shape[0]))
        return img.astype(np.float32) / 255.0

    K = dummy_calibration(shape[1], shape[0])
    accum = TrajectoryAccumulator()
    for i in range(1, len(files) - 1):
        target = load(files[i])
        refs = np.stack([load(files[i - 1]), load(files[i + 1])])
        _, poses = infer(variables, jnp.asarray(target[None]),
                         jnp.asarray(refs[None]), jnp.asarray(K[None]))
        poses = np.asarray(poses)
        accum.add(poses[0], poses[1])   # pose21 (prev), pose23 (next)
        print(f"[{i}/{len(files) - 2}] {os.path.basename(files[i])}")

    accum.save_json(args.output)
    print(f"trajectory ({len(accum.trajectory)} poses) -> {args.output}")
    if args.plot:
        from dro_sfm_tpu.visualization.trajectory import plot_trajectory
        plot_trajectory(args.plot, accum.trajectory)
        print(f"plot -> {args.plot}")


if __name__ == "__main__":
    main()
