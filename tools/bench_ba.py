"""Dense-BA benchmark: ATE convergence + per-iteration device time.

Runs the scaled demonstration problem (keyframe trajectory over an
exactly-rendered smooth surface, odometry + loop-closure covisibility
edges, noisy poses with bounded outlier keyframes and mis-scaled depths)
on the attached accelerator and prints one JSON line with the ATE
before/after refinement and the steady-state per-GN-iteration wall time.
Use --sharded to run the distributed (edge-sharded shard_map) optimizer
over all local devices; --schedule selects plain single-level GN, the
graduated-non-convexity continuation (gnc) or the depth-pyramid
coarse-to-fine (c2f).

    python tools/bench_ba.py [--keyframes 128] [--height 64] [--width 96]
                             [--schedule gnc] [--sharded]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_problem(k: int, h: int, w: int, seed: int = 0,
                  twist_sigma: float = 0.06, outlier: float = 0.14):
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from tests.test_ba import _trajectory_problem
    from dro_sfm_tpu.ba.lie import se3_exp

    rng = np.random.default_rng(seed)
    problem, gt_poses = _trajectory_problem(rng, k=k, h=h, w=w)
    noise = rng.normal(size=(k, 6)) * twist_sigma
    # Outlier keyframes at a controlled twist magnitude, one per ~16
    # frames (scales with the trajectory length).
    for o in range(5, k, 16):
        noise[o] *= outlier / np.linalg.norm(noise[o])
    noise[0] = 0.0
    init_poses = problem.poses @ se3_exp(jnp.asarray(noise, jnp.float32))
    scale_noise = 1.0 + rng.normal(size=(k,)) * 0.03
    scale_noise[0] = 1.0
    init = problem._replace(
        poses=init_poses,
        depths=problem.depths * jnp.asarray(scale_noise,
                                            jnp.float32)[:, None, None])
    return init, gt_poses


def main():
    from dro_sfm_tpu.utils.misc import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--keyframes", type=int, default=32)
    p.add_argument("--height", type=int, default=48)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--stride", type=int, default=2)
    p.add_argument("--twist-sigma", type=float, default=0.06)
    p.add_argument("--outlier", type=float, default=0.14)
    p.add_argument("--schedule", choices=("plain", "gnc", "c2f", "robust"),
                   default="plain")
    p.add_argument("--sharded", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from dro_sfm_tpu.ba.dense_ba import (
        C2F_STAGES, EDGE_STAGES, GNC_STAGES, make_sharded_optimizer,
        optimize_dense_ba, optimize_dense_ba_robust,
        optimize_dense_ba_scheduled)
    from dro_sfm_tpu.visualization.trajectory import (
        absolute_trajectory_error)

    init, gt_poses = build_problem(args.keyframes, args.height, args.width,
                                   twist_sigma=args.twist_sigma,
                                   outlier=args.outlier)

    mesh = None
    if args.sharded:
        from dro_sfm_tpu.parallel.mesh import make_mesh
        n_dev = len(jax.devices())
        e = init.edges_i.shape[0]
        pad = (-e) % n_dev
        init = init._replace(
            edges_i=jnp.concatenate([init.edges_i,
                                     jnp.zeros(pad, jnp.int32)]),
            edges_j=jnp.concatenate([init.edges_j,
                                     jnp.zeros(pad, jnp.int32)]))
        mesh = make_mesh(jax.devices())

    stages = {"gnc": GNC_STAGES, "c2f": C2F_STAGES}.get(args.schedule)
    if args.schedule == "robust":
        # Front-end two-frame alignments + robust PGO + GNC dense BA.
        total_iters = (sum(s[1] for s in EDGE_STAGES)
                       + sum(s[2] for s in GNC_STAGES))
        opt = lambda prob: optimize_dense_ba_robust(  # noqa: E731
            prob, stride=args.stride, mesh=mesh)
    elif stages is not None:
        total_iters = sum(s[2] for s in stages)
        opt = lambda prob: optimize_dense_ba_scheduled(  # noqa: E731
            prob, stages=stages, stride=args.stride, mesh=mesh)
    else:
        total_iters = args.iters
        if mesh is not None:
            run = make_sharded_optimizer(mesh, stride=args.stride,
                                         iters=args.iters, max_step=0.1)
            opt = lambda prob: run(prob)  # noqa: E731
        else:
            opt = lambda prob: optimize_dense_ba(  # noqa: E731
                prob, stride=args.stride, iters=args.iters, max_step=0.1)

    # Compile + converge once, then time steady-state repeats (inputs
    # perturbed per repeat so no layer can serve a cached result).
    # Timing anchors on a HOST FETCH of a value data-dependent on the
    # result: on the remote-attached axon backend block_until_ready does
    # not reliably wait for device execution (see bench.py header) —
    # round-5 fix; earlier TPU rows under-reported per-iteration time.
    def fetch(res):
        return float(np.asarray(jax.device_get(res[0]))[0, 0, 0])

    poses, sigmas = opt(init)
    fetch((poses, sigmas))
    times = []
    for i in range(5):
        pert = init._replace(depths=init.depths + 1e-6 * (i + 1))
        t0 = time.perf_counter()
        fetch(opt(pert))
        times.append(time.perf_counter() - t0)
    per_iter_ms = 1000.0 * min(times) / total_iters

    ate0 = absolute_trajectory_error(np.asarray(init.poses), gt_poses)
    ate1 = absolute_trajectory_error(np.asarray(poses), gt_poses)
    n_edges = int(init.edges_i.shape[0])
    print(json.dumps({
        "metric": "dense_ba",
        "platform": jax.default_backend(),
        "n_devices": len(jax.devices()),
        "sharded": bool(args.sharded),
        "schedule": args.schedule,
        "keyframes": args.keyframes,
        "edges": n_edges,
        "depth_res": [args.height, args.width],
        "stride": args.stride,
        "twist_sigma": args.twist_sigma,
        "outlier": args.outlier,
        "iters": total_iters,
        "ate_init": round(ate0, 5),
        "ate_refined": round(ate1, 5),
        "ate_reduction": round(ate0 / max(ate1, 1e-12), 2),
        "gn_iter_ms": round(per_iter_ms, 3),
        "edges_per_sec": round(n_edges * total_iters / min(times), 1),
    }))


if __name__ == "__main__":
    main()
