"""Offline point-cloud / trajectory renderer.

Counterpart of `/root/reference/scripts/vis.py` (an interactive vtk viewer
run in a subprocess): renders a .ply point cloud and/or trajectory json to
turntable images or an mp4, CI- and headless-friendly (matplotlib, no vtk).

Usage:
    python scripts/vis.py --ply out/pointcloud.ply --output out/render.mp4
    python scripts/vis.py --trajectory out/trajectory.json --output traj.png
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def read_ply(path):
    import numpy as np
    pts, cols = [], []
    with open(path) as f:
        n = 0
        has_color = False
        for line in f:
            line = line.strip()
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            if line.startswith("property uchar red"):
                has_color = True
            if line == "end_header":
                break
        for _ in range(n):
            parts = f.readline().split()
            pts.append([float(x) for x in parts[:3]])
            if has_color:
                cols.append([int(x) / 255.0 for x in parts[3:6]])
    import numpy as np
    return np.asarray(pts), (np.asarray(cols) if cols else None)


def main():
    from dro_sfm_tpu.utils.misc import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser(description="offline 3D rendering")
    p.add_argument("--ply", default=None)
    p.add_argument("--trajectory", default=None, help="trajectory json")
    p.add_argument("--output", required=True, help=".png or .mp4")
    p.add_argument("--frames", type=int, default=60,
                   help="turntable frames for video output")
    p.add_argument("--max-points", type=int, default=100000)
    args = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")

    if args.ply:
        pts, cols = read_ply(args.ply)
        if pts.shape[0] > args.max_points:
            sel = np.random.default_rng(0).choice(
                pts.shape[0], args.max_points, replace=False)
            pts = pts[sel]
            cols = cols[sel] if cols is not None else None
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=0.5, c=cols)
    if args.trajectory:
        with open(args.trajectory) as f:
            poses = [np.asarray(m) for m in json.load(f)]
        xyz = np.asarray([T[:3, 3] for T in poses])
        ax.plot(xyz[:, 0], xyz[:, 1], xyz[:, 2], "r-", linewidth=2)
        ax.scatter(*xyz[0], c="g", s=40)
    ax.set_axis_off()

    if args.output.endswith(".png"):
        fig.savefig(args.output, dpi=130, bbox_inches="tight")
        print(f"wrote {args.output}")
        return
    # Turntable mp4
    import cv2
    writer = None
    for i in range(args.frames):
        ax.view_init(elev=20, azim=i * 360.0 / args.frames)
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        if writer is None:
            writer = cv2.VideoWriter(
                args.output, cv2.VideoWriter_fourcc(*"mp4v"), 15,
                (buf.shape[1], buf.shape[0]))
        writer.write(buf[..., ::-1])
    writer.release()
    print(f"wrote {args.output} ({args.frames} frames)")


if __name__ == "__main__":
    main()
