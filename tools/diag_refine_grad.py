"""Localize the gather-vs-pallas full-model gradient divergence by
refinement depth (docs/convergence_selfsup_r5.md).

Single-cost gradients match to 1e-7 (tools/diag_cost_grad.py) yet the
full selfsup gradient diverges (cosine 0.67, tools/diag_model_grad.py).
This probes the pure network forward (no loss): gradients of a fixed
random projection of (inv_depths, pose_vecs) w.r.t. params, at
increasing refinement depth (it4 = 1 outer iteration, it8 = 2, it12 =
3), plus per-output-component cosines, to see where the divergence
enters and whether it rides the depth or the pose stack.

Usage: python tools/diag_refine_grad.py [--versions it4,it8,it12]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--versions", default="it4-h-out,it8-h-out,it12-h-out")
    ap.add_argument("--heads", default="both,depth,pose")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dro_sfm_tpu.models.depth_pose_net import DepthPoseNet
    from tools.diag_model_grad import get_batch

    batch = {k: jnp.asarray(v) for k, v in get_batch().items()
             if not isinstance(v, (list, tuple))}
    target, refs, K = (batch["rgb"], batch["rgb_context"],
                       batch["intrinsics"])

    for version in args.versions.split(","):
        nets = {}
        for impl in ("gather", "pallas"):
            nets[impl] = DepthPoseNet(version=version, min_depth=0.2,
                                      max_depth=20.0, warp_impl=impl,
                                      remat=True, unroll="none")
        variables = jax.jit(lambda: nets["gather"].init(
            jax.random.PRNGKey(42), target, refs, K, train=False))()

        rng = np.random.default_rng(5)
        out0 = jax.eval_shape(
            lambda v: nets["gather"].apply(v, target, refs, K, train=False),
            variables)
        Wd = jnp.asarray(rng.normal(size=out0["inv_depths"].shape),
                         jnp.float32)
        Wp = jnp.asarray(rng.normal(size=out0["pose_vecs"].shape),
                         jnp.float32)

        for head in args.heads.split(","):
            grads = {}
            for impl in ("gather", "pallas"):
                def loss(params, impl=impl):
                    out = nets[impl].apply(
                        {"params": params,
                         "batch_stats": variables["batch_stats"]},
                        target, refs, K, train=False)
                    ld = jnp.sum(out["inv_depths"] * Wd)
                    lp = jnp.sum(out["pose_vecs"] * Wp)
                    return {"both": ld + lp, "depth": ld,
                            "pose": lp}[head]

                val, g = jax.jit(jax.value_and_grad(loss))(
                    variables["params"])
                grads[impl] = [np.asarray(x, np.float64) for x in
                               jax.tree_util.tree_leaves(g)]
                if impl == "gather":
                    ref_val = float(val)
                else:
                    dv = abs(float(val) - ref_val) / max(abs(ref_val), 1e-12)
                    dot = sum((a * e).sum() for a, e in
                              zip(grads["pallas"], grads["gather"]))
                    na = np.sqrt(sum((a ** 2).sum()
                                     for a in grads["pallas"]))
                    ne = np.sqrt(sum((e ** 2).sum()
                                     for e in grads["gather"]))
                    print(f"{version:10s} head={head:5s} "
                          f"fwd_rel={dv:.3e} "
                          f"cos={dot / max(na * ne, 1e-12):.8f} "
                          f"|g_pallas|={na:.6g} |g_gather|={ne:.6g}")


if __name__ == "__main__":
    main()
