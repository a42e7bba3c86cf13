"""Bisect the gather-vs-pallas gradient mismatch with REAL model tensors.

tools/diag_model_grad.py shows cosine 0.67 between full-model selfsup
gradients under warp_impl gather vs pallas at init, while synthetic
kernel probes show 1e-7 parity. This tool rebuilds the exact inputs of
the FIRST depth-refinement cost evaluation from the real net at init
(fnet features, depth_head inv-depth, pose_head poses, scaled
intrinsics) and compares gradients of the isolated cost computation
through both implementations, printing coordinate statistics (how many
land exactly on integers, spread, z-clamp hits) along the way.

Usage: python tools/diag_cost_grad.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from dro_sfm_tpu.models.depth_pose_net import (
        DepthPoseNet, _proj_affine, _proj_to_coords, _sample_cost)
    from dro_sfm_tpu.geometry.pose import pose_vec_to_mat
    from dro_sfm_tpu.ops.depth_ops import disp_to_depth, inv2depth
    from dro_sfm_tpu.geometry.camera import pixel_grid, scale_intrinsics
    from tools.diag_model_grad import get_batch

    batch = {k: jnp.asarray(v) for k, v in get_batch().items()
             if not isinstance(v, (list, tuple))}
    target = batch["rgb"]
    refs = batch["rgb_context"]
    K = batch["intrinsics"]
    b, n = refs.shape[0], refs.shape[1]
    h_img, w_img = target.shape[1], target.shape[2]

    net = DepthPoseNet(version="it12-h-out", min_depth=0.2, max_depth=20.0,
                      warp_impl="gather", remat=True, unroll="none")
    variables = jax.jit(lambda: net.init(
        jax.random.PRNGKey(42), target, refs, K, train=False))()

    # Rebuild step-0 inputs exactly as DepthPoseNet.__call__ does.
    from dro_sfm_tpu.models.encoder import ResNetEncoder
    from dro_sfm_tpu.models.update import DepthHead, PoseHead
    fnet = ResNetEncoder(out_chs=128, stride=8)
    all_imgs = jnp.concatenate([target[:, None], refs], axis=1)
    fvars = {"params": variables["params"]["fnet"],
             "batch_stats": variables["batch_stats"]["fnet"]}
    fmaps = fnet.apply(fvars, all_imgs.reshape(b * (n + 1), h_img, w_img, 3),
                       train=False)
    fmaps = fmaps.reshape(b, n + 1, *fmaps.shape[1:])
    fmap1, fmaps_ref = fmaps[:, 0], fmaps[:, 1:]
    h, w = fmap1.shape[1], fmap1.shape[2]

    depth_head = DepthHead(hidden_dim=128)
    inv0 = depth_head.apply({"params": variables["params"]["depth_head"]},
                            fmap1, act_fn=nn.sigmoid)
    pose_head = PoseHead(hidden_dim=128)
    pair = jnp.concatenate(
        [jnp.broadcast_to(fmap1[:, None], fmaps_ref.shape), fmaps_ref],
        axis=-1).reshape(b * n, h, w, 256)
    pose0 = pose_head.apply({"params": variables["params"]["pose_head"]},
                            pair).reshape(b, n, 6)
    K_s = scale_intrinsics(K, 1.0 / 8)

    def coords_of(inv_depth, poses):
        scaled = disp_to_depth(inv_depth, 0.2, 20.0)[0]
        depth = inv2depth(scaled)
        A, bvec = _proj_affine(K_s, pose_vec_to_mat(poses, "euler"))
        grid = pixel_grid(h, w, dtype=jnp.float32)
        G = jnp.einsum("bnij,hwj->bnhwi", A, grid)
        proj = G * depth[:, None] + bvec[:, :, None, None, :]
        return _proj_to_coords(proj)

    co = np.asarray(coords_of(inv0, pose0))
    gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    grid_np = np.stack([gx, gy], -1)[None, None].astype(np.float32)
    d = co - grid_np
    print(f"coords: shape {co.shape}  |c-grid| mean={np.abs(d).mean():.3e} "
          f"max={np.abs(d).max():.3e}")
    print(f"exact-integer fraction: {(co == np.round(co)).mean():.4f}")
    print(f"frac within 1e-6 of integer: "
          f"{(np.abs(co - np.round(co)) < 1e-6).mean():.4f}")

    W = jnp.asarray(np.random.default_rng(3).normal(
        size=(b, n, h, w, fmap1.shape[-1])), jnp.float32)

    grads = {}
    for impl in ("gather", "pallas"):
        def loss(f1, fr, inv_depth, poses, impl=impl):
            cost = _sample_cost(f1, fr, coords_of(inv_depth, poses), impl)
            return jnp.sum(cost * W)

        val, g = jax.jit(jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3)))(fmap1, fmaps_ref, inv0, pose0)
        grads[impl] = [np.asarray(x, np.float64) for x in g]
        print(f"{impl:7s} loss={float(val):.6f} "
              + " ".join(f"|g{i}|={np.linalg.norm(x):.6g}"
                         for i, x in enumerate(grads[impl])))

    names = ("d_fmap1", "d_fref", "d_inv_depth", "d_pose")
    for name, a, e in zip(names, grads["pallas"], grads["gather"]):
        denom = max(np.abs(e).max(), 1e-12)
        cos = (a * e).sum() / max(np.linalg.norm(a) * np.linalg.norm(e),
                                  1e-12)
        print(f"{name:12s} maxabs={np.abs(a - e).max():.3e} "
              f"rel={np.abs(a - e).max() / denom:.3e} cos={cos:.8f}")


if __name__ == "__main__":
    main()
