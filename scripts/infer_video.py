"""Full SfM demo CLI: video/folder -> depth maps, trajectory, point cloud.

Equivalent of `/root/reference/scripts/infer_video.py` (the reference's
flagship demo app): parse a video into frames (or take a frame folder), run
3-frame sliding-window inference, chain poses with monocular scale
propagation, filter depths, optionally fuse them with multi-view geometric
consistency, accumulate a global colored point cloud, and write a side-by-
side RGB/depth visualization video. The vtk live viewer is replaced by
offline ply + trajectory-png artifacts (CI-friendly).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMG_EXT = (".png", ".jpg", ".jpeg", ".bmp")
VIDEO_EXT = (".mp4", ".avi", ".mov", ".mpeg", ".flv", ".wmv")


def parse_args():
    p = argparse.ArgumentParser(description="dro-sfm-tpu video SfM")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--input", required=True, help="video file or frame folder")
    p.add_argument("--output", required=True, help="output folder")
    p.add_argument("--sample-rate", type=int, default=1)
    p.add_argument("--max-frames", type=int, default=500)
    p.add_argument("--image-shape", type=int, nargs=2, default=None)
    p.add_argument("--fusion-views", type=int, default=0,
                   help=">0 enables geometric-consistency fusion over N views")
    p.add_argument("--depth-max", type=float, default=10.0)
    p.add_argument("--grad-max", type=float, default=0.05)
    p.add_argument("--ply-stride", type=int, default=4,
                   help="subsample factor for point-cloud accumulation")
    p.add_argument("--ba", action="store_true",
                   help="refine the keyframe trajectory with distributed "
                        "dense bundle adjustment (Schur-reduced GN)")
    p.add_argument("--ba-stride", type=int, default=2,
                   help="keyframe subsampling for BA")
    p.add_argument("--gt-poses", default=None,
                   help="directory of per-frame GT pose txts ([4,4], "
                        "matched by frame basename); enables the GT "
                        "trajectory panels + ATE printout")
    p.add_argument("--gt-depth", default=None,
                   help="directory of per-frame GT depth pngs (mm, matched "
                        "by basename) for the GT-depth panel")
    p.add_argument("--fps", type=float, default=10.0)
    return p.parse_args()


def parse_video(video_file, save_root, sample_rate):
    """Extract frames (`infer_video.py:594-616`)."""
    import cv2
    os.makedirs(save_root, exist_ok=True)
    cap = cv2.VideoCapture(video_file)
    count = saved = 0
    while cap.isOpened():
        ret, img = cap.read()
        if not ret:
            break
        if count % sample_rate == 0:
            cv2.imwrite(os.path.join(save_root, f"{saved:06d}.jpg"), img)
            saved += 1
        count += 1
    cap.release()
    return saved


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
        filter_depth,
        geometric_fusion,
        load_model,
        make_infer_fn,
    )
    from dro_sfm_tpu.utils.depth import viz_inv_depth
    from dro_sfm_tpu.visualization.demo_video import (
        DemoVideoComposer,
        align_to_gt,
        cloud_topdown_panel,
        draw_trajectory_panel,
        load_gt_poses,
        poses_to_obj,
    )
    from dro_sfm_tpu.visualization.pointcloud import depth_to_points, write_ply
    from dro_sfm_tpu.visualization.trajectory import plot_trajectory

    os.makedirs(args.output, exist_ok=True)

    # Input handling: video -> frames, or frame folder.
    src = args.input
    if not os.path.isdir(src):
        assert os.path.splitext(src)[1].lower() in VIDEO_EXT, src
        frames_dir = os.path.join(args.output, "input_frames")
        n = parse_video(src, frames_dir, args.sample_rate)
        print(f"extracted {n} frames")
        src = frames_dir
        files = sorted(os.listdir(src))
    else:
        files = sorted(f for f in os.listdir(src)
                       if f.lower().endswith(IMG_EXT))[::args.sample_rate]
    files = [os.path.join(src, f) for f in files][:args.max_frames]
    assert len(files) > 2, "need at least 3 frames"

    net, variables, cfg = load_model(args.checkpoint)
    infer = make_infer_fn(net)
    shape = tuple(args.image_shape or cfg.datasets.augmentation.image_shape)
    K = dummy_calibration(shape[1], shape[0])

    def load(f):
        img = cv2.imread(f, cv2.IMREAD_COLOR)[..., ::-1]
        img = cv2.resize(img, (shape[1], shape[0]))
        return img.astype(np.float32) / 255.0

    accum = TrajectoryAccumulator()
    depth_list, pose_list = [], []
    all_points, all_colors = [], []
    # Full-res depths stream to a memmapped depths.npy (long sequences must
    # not buffer O(frames) float32 maps in RAM); per-frame panel snapshots
    # (half-res, for the post-BA annotated composition) spill to PNGs under
    # <output>/panels/ for the same reason.
    n_out = len(files) - 2
    depths_out = None
    ph, pw = shape[0] // 2, shape[1] // 2
    panels_dir = os.path.join(args.output, "panels")
    os.makedirs(panels_dir, exist_ok=True)

    def spill(kind, idx, img_rgb):
        cv2.imwrite(os.path.join(panels_dir, f"{kind}_{idx:06d}.png"),
                    img_rgb[..., ::-1])

    def unspill(kind, idx):
        img = cv2.imread(os.path.join(panels_dir, f"{kind}_{idx:06d}.png"),
                         cv2.IMREAD_COLOR)
        return None if img is None else img[..., ::-1]

    cloud_counts = []
    frame_names = []

    for i in range(1, len(files) - 1):
        target = load(files[i])
        refs = np.stack([load(files[i - 1]), load(files[i + 1])])
        depth, poses = infer(variables, jnp.asarray(target[None]),
                             jnp.asarray(refs[None]), jnp.asarray(K[None]))
        depth = np.asarray(depth)
        poses = np.asarray(poses)
        if depths_out is None:
            depths_out = np.lib.format.open_memmap(
                os.path.join(args.output, "depths.npy"), mode="w+",
                dtype=np.float32, shape=(n_out, *depth.shape))
        depths_out[i - 1] = depth

        global_pose = accum.add(poses[0], poses[1])
        filtered = filter_depth(depth, grad_max=args.grad_max,
                                depth_max=args.depth_max)
        depth_list.append(filtered)
        pose_list.append(global_pose)

        if args.fusion_views > 1 and len(depth_list) > args.fusion_views:
            fused = geometric_fusion(
                jnp.asarray(depth_list[-1]),
                jnp.asarray(np.stack(depth_list[-args.fusion_views:-1])),
                jnp.asarray(pose_list[-1]),
                jnp.asarray(np.stack(pose_list[-args.fusion_views:-1])),
                jnp.asarray(K), thres_view=args.fusion_views // 2)
            filtered = np.asarray(fused)

        # Accumulate point cloud (subsampled).
        s = args.ply_stride
        K_sub = K.copy()
        K_sub[0] /= s
        K_sub[1] /= s
        pts, colors = depth_to_points(
            filtered[::s, ::s], K_sub, global_pose, target[::s, ::s])
        all_points.append(pts)
        all_colors.append(colors)

        # Panel snapshots: rgb, inverse-depth colormap, validity-mask
        # overlay, optional GT depth; cloud panels use cumulative counts.
        inv = np.where(depth > 0, 1.0 / np.maximum(depth, 1e-6), 0.0)
        viz = (viz_inv_depth(inv) * 255).astype(np.uint8)
        rgb_u8 = (target * 255).astype(np.uint8)
        valid = (filtered > 0).astype(np.float32)[..., None]
        overlay = (rgb_u8 * (0.35 + 0.65 * valid)).astype(np.uint8)
        m = i - 1
        spill("rgb", m, cv2.resize(rgb_u8, (pw, ph)))
        spill("depth", m, cv2.resize(viz, (pw, ph)))
        spill("mask", m, cv2.resize(overlay, (pw, ph)))
        if args.gt_depth:
            base = os.path.splitext(os.path.basename(files[i]))[0]
            gtp = os.path.join(args.gt_depth, base + ".png")
            if os.path.exists(gtp):
                from dro_sfm_tpu.data.scannet import read_png_depth_mm
                gtd = read_png_depth_mm(gtp)[..., 0]
                gti = np.where(gtd > 0, 1.0 / np.maximum(gtd, 1e-6), 0.0)
                gtv = (viz_inv_depth(gti) * 255).astype(np.uint8)
                spill("gtd", m, cv2.resize(gtv, (pw, ph)))
        cloud_counts.append(sum(len(p) for p in all_points))
        frame_names.append(os.path.basename(files[i]))
        if i % 10 == 0:
            print(f"[{i}/{len(files) - 2}] frames processed")

    if depths_out is not None:
        depths_out.flush()  # already on disk via the memmap

    if args.ba and len(pose_list) >= 3:
        # Keyframe dense BA: depth-consistency refinement of the chained
        # trajectory (downsampled depth maps, covisibility = +-2 keyframes).
        from dro_sfm_tpu.ba import BAProblem, optimize_dense_ba
        kf = list(range(0, len(pose_list), args.ba_stride))
        s = 4  # depth downsample for BA
        K_ba = K.copy()
        K_ba[0] /= s
        K_ba[1] /= s
        kf_depths = np.stack([depths_out[i][::s, ::s] for i in kf])
        kf_poses = np.stack([pose_list[i] for i in kf]).astype(np.float32)
        ei, ej = [], []
        for a in range(len(kf)):
            for b_ in range(max(0, a - 2), min(len(kf), a + 3)):
                if a != b_:
                    ei.append(a)
                    ej.append(b_)
        import jax.numpy as jnp2
        problem = BAProblem(jnp2.asarray(kf_poses), jnp2.asarray(kf_depths),
                            jnp2.asarray(K_ba), jnp2.asarray(ei),
                            jnp2.asarray(ej))
        refined, sigmas = optimize_dense_ba(problem, stride=1, iters=6)
        refined = np.asarray(refined)
        for a, i in enumerate(kf):
            pose_list[i] = refined[a]
        accum.trajectory = pose_list
        np.save(os.path.join(args.output, "ba_scales.npy"),
                np.exp(np.asarray(sigmas)))
        print(f"dense BA refined {len(kf)} keyframes "
              f"(scales {np.exp(np.asarray(sigmas)).round(3)})")

    # GT trajectory mode: per-frame pose txts -> aligned overlay + ATE.
    gt_poses = (load_gt_poses(args.gt_poses, files[1:len(files) - 1])
                if args.gt_poses else None)
    ate = None
    gt_positions = None
    aligned_poses = None
    if gt_poses is not None and len(gt_poses) == len(pose_list):
        aligned, ate = align_to_gt(pose_list, gt_poses)
        gt_positions = np.stack([p[:3, 3] for p in gt_poses])
        # The vs-GT panel must draw the sim3-ALIGNED prediction (monocular
        # scale/frame is arbitrary; raw positions would diverge from GT
        # while the label quotes the aligned ATE).
        aligned_poses = []
        for a in aligned:
            T = np.eye(4)
            T[:3, 3] = a
            aligned_poses.append(T)
        print(f"ATE-RMSE vs GT trajectory (sim3-aligned): {ate:.4f} m")
    elif args.gt_poses:
        print("warning: GT poses missing/unmatched; trajectory panels "
              "render pred only")

    accum.save_json(os.path.join(args.output, "trajectory.json"))
    plot_trajectory(os.path.join(args.output, "trajectory.png"),
                    accum.trajectory, gt_poses=gt_poses)
    poses_to_obj(os.path.join(args.output, "trajectory_pose.obj"), pose_list)
    pts = np.concatenate(all_points)
    colors = np.concatenate(all_colors)
    write_ply(os.path.join(args.output, "pointcloud.ply"), pts, colors)

    # Annotated multi-panel composition (after BA so trajectories reflect
    # the refined keyframes; `infer_video.py:723-846`).
    composer = DemoVideoComposer(
        shape, model_path=args.checkpoint, data_path=args.input,
        sample_rate=args.sample_rate, max_frames=args.max_frames,
        fps=args.fps)
    video_path = os.path.join(args.output, "depth_vis.mp4")
    H, W = composer.frame_size
    writer = cv2.VideoWriter(video_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             args.fps, (W, H))
    panel_size = (ph, pw)
    for i in range(len(frame_names)):
        panels = {
            "rgb": unspill("rgb", i),
            "mask": unspill("mask", i),
            "depth": unspill("depth", i),
            "traj": draw_trajectory_panel(pose_list, i, size=panel_size,
                                          label="pred"),
            "cloud": cloud_topdown_panel(
                pts[:cloud_counts[i]] if cloud_counts[i] else pts[:0],
                colors[:cloud_counts[i]] if cloud_counts[i] else colors[:0],
                size=panel_size),
        }
        gtd = unspill("gtd", i) if args.gt_depth else None
        if gtd is not None:
            panels["depth_gt"] = gtd
        if gt_positions is not None:
            panels["traj_vs_gt"] = draw_trajectory_panel(
                aligned_poses, i, size=panel_size, overlay=gt_positions,
                label="pred-sim3(b) vs gt(r)")
            panels["traj_gt"] = draw_trajectory_panel(
                gt_poses, i, size=panel_size, color=(255, 90, 90),
                label="gt")
        frame = composer.compose(panels, i, frame_names[i], ate=ate)
        writer.write(frame[..., ::-1])
    writer.release()
    print(f"outputs in {args.output}: depths.npy, trajectory.json/png/obj, "
          f"pointcloud.ply ({pts.shape[0]} points), depth_vis.mp4 "
          f"({W}x{H} annotated 8-panel)")


if __name__ == "__main__":
    main()
