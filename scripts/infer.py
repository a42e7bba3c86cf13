"""Depth inference CLI for images/folders.

Equivalent of `/root/reference/scripts/infer.py`: run a trained model over a
single image or a folder, saving depth (npz/png) and colormapped
visualizations, optionally a point cloud. Multi-frame models take the
neighboring frames in the folder as context (the reference's single-frame
script predates the MF models; this one supports both sliding-window context
and duplicated-frame fallback for isolated images).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMG_EXT = (".png", ".jpg", ".jpeg", ".bmp")


def parse_args():
    p = argparse.ArgumentParser(description="dro-sfm-tpu depth inference")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--input", required=True, help="image file or folder")
    p.add_argument("--output", required=True, help="output folder")
    p.add_argument("--save", default="npz", choices=["npz", "png", "viz"])
    p.add_argument("--ply", action="store_true",
                   help="also export a point cloud per frame")
    p.add_argument("--image-shape", type=int, nargs=2, default=None)
    return p.parse_args()


def main():
    from dro_sfm_tpu.utils.misc import apply_platform_env
    apply_platform_env()
    args = parse_args()
    import cv2
    import numpy as np
    import jax.numpy as jnp

    from dro_sfm_tpu.data.video import dummy_calibration
    from dro_sfm_tpu.inference import load_model, make_infer_fn
    from dro_sfm_tpu.utils.depth import viz_inv_depth, write_depth
    from dro_sfm_tpu.visualization.pointcloud import export_pointcloud

    net, variables, cfg = load_model(args.checkpoint)
    infer = make_infer_fn(net)
    shape = tuple(args.image_shape or cfg.datasets.augmentation.image_shape)

    if os.path.isdir(args.input):
        files = sorted(f for f in os.listdir(args.input)
                       if f.lower().endswith(IMG_EXT))
        files = [os.path.join(args.input, f) for f in files]
    else:
        files = [args.input]
    assert files, f"no images found in {args.input}"
    os.makedirs(args.output, exist_ok=True)

    def load(f):
        img = cv2.imread(f, cv2.IMREAD_COLOR)[..., ::-1]
        img = cv2.resize(img, (shape[1], shape[0]),
                         interpolation=cv2.INTER_LINEAR)
        return img.astype(np.float32) / 255.0

    K = dummy_calibration(shape[1], shape[0])
    for i, f in enumerate(files):
        target = load(f)
        # Sliding-window context; duplicate the frame at boundaries.
        prev_f = files[i - 1] if i > 0 else f
        next_f = files[i + 1] if i + 1 < len(files) else f
        refs = np.stack([load(prev_f), load(next_f)])
        depth, poses = infer(
            variables, jnp.asarray(target[None]), jnp.asarray(refs[None]),
            jnp.asarray(K[None]))
        depth = np.asarray(depth)

        base = os.path.join(
            args.output, os.path.splitext(os.path.basename(f))[0])
        if args.save in ("npz", "png"):
            write_depth(f"{base}.{args.save}", depth, intrinsics=K)
        else:
            inv = np.where(depth > 0, 1.0 / np.maximum(depth, 1e-6), 0.0)
            viz = (viz_inv_depth(inv) * 255).astype(np.uint8)
            panel = np.concatenate(
                [(target * 255).astype(np.uint8), viz], axis=0)
            cv2.imwrite(f"{base}_viz.png", panel[..., ::-1])
        if args.ply:
            export_pointcloud(f"{base}.ply", depth, K, rgb=target)
        print(f"[{i + 1}/{len(files)}] {f} -> {base}.{args.save}")


if __name__ == "__main__":
    main()
