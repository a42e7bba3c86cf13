"""On-device component timing: where does the step time go?

Times, at the flagship operating point (it12-h-out, 192x640, b4):
  encoder     — fnet+cnets forward alone
  forward     — full network forward (no loss)
  fwd+loss    — forward + supervised loss
  train       — full train step (forward + loss + backward + Adam)
  bwd-network — grad of (forward output sum) w.r.t. params: backward without
                the loss graph
Every timing uses the forced-fetch pattern (see bench.py).

Usage: python tools/perf_components.py [--batch 4] [--steps 20]
       [--mixed-precision] [--remat]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--views", type=int, default=2)
    ap.add_argument("--mixed-precision", action="store_true")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--scan-unroll", default="none",
                    choices=["none", "inner", "full"])
    ap.add_argument("--warp-impl", default="gather",
                    choices=["gather", "matmul", "pallas"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tools.perf_ablate import make_batch
    from dro_sfm_tpu.models.sfm import SfmModelConfig, forward, compute_loss
    from dro_sfm_tpu.training.state import create_train_state, make_optimizer
    from dro_sfm_tpu.training.step import make_train_step
    from dro_sfm_tpu.utils.config import load_config

    b, n, h, w = args.batch, args.views, 192, 640
    batch = make_batch(b, n, h, w)

    model_cfg = SfmModelConfig(
        name="SupModelMF", version="it12-h-out", min_depth=0.2, max_depth=80.0,
        flip_lr_prob=0.0, mixed_precision=args.mixed_precision,
        remat=args.remat, scan_unroll=args.scan_unroll,
        warp_impl=args.warp_impl)
    net = model_cfg.build_net()
    cfg = load_config()
    tx = make_optimizer(cfg.model.optimizer, cfg.model.scheduler, 1000)
    state = create_train_state(
        net, jax.random.PRNGKey(0),
        {k: batch[k] for k in ("rgb", "rgb_context", "intrinsics")}, tx)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def timeit(name, fn, *fargs):
        t0 = time.perf_counter()
        out = fn(*fargs)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf).ravel()[0])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = fn(*fargs)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf).ravel()[0])
        dt = (time.perf_counter() - t0) / args.steps
        print(json.dumps({"component": name, "ms": round(dt * 1e3, 2),
                          "compile_s": round(compile_s, 1)}), flush=True)

    # encoder forward only
    from dro_sfm_tpu.models.encoder import ResNetEncoder
    enc = ResNetEncoder(out_chs=128, stride=8,
                        dtype=jnp.bfloat16 if args.mixed_precision
                        else jnp.float32)
    enc_vars = jax.jit(lambda r, x: enc.init(r, x, train=False))(
        jax.random.PRNGKey(0), batch["rgb"])
    all_imgs = jnp.concatenate(
        [batch["rgb"][:, None], batch["rgb_context"]], axis=1)
    all_imgs = all_imgs.reshape(b * (n + 1), h, w, 3)
    enc_fwd = jax.jit(lambda v, x: enc.apply(v, x, train=False))
    timeit("encoder", enc_fwd, enc_vars, all_imgs)

    # network forward, no loss
    fwd = jax.jit(lambda v, bt: forward(net, v, bt, train=False)[0])
    timeit("forward", fwd, variables, batch)

    # forward + loss
    def fwd_loss(v, bt):
        out, _ = forward(net, v, bt, train=False)
        return compute_loss(model_cfg, out, bt)[0]
    fwd_loss_j = jax.jit(fwd_loss)
    timeit("fwd+loss", fwd_loss_j, variables, batch)

    # backward of the network only (sum-of-outputs objective)
    def net_obj(params, bt):
        v = {"params": params, "batch_stats": state.batch_stats}
        out, _ = forward(net, v, bt, train=False)
        return out["inv_depths"].sum() + out["pose_vecs"].sum()
    bwd_net = jax.jit(jax.grad(net_obj))
    timeit("fwd+bwd-network", bwd_net, state.params, batch)

    # full train step
    train_step = make_train_step(model_cfg, net)
    rng = jax.random.PRNGKey(1)

    def step_fn(s):
        s2, _ = train_step(s, batch, rng)
        return s2
    t0 = time.perf_counter()
    state = step_fn(state)
    float(np.asarray(jax.tree_util.tree_leaves(state.params)[0]).ravel()[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state = step_fn(state)
    float(np.asarray(jax.tree_util.tree_leaves(state.params)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / args.steps
    print(json.dumps({"component": "train-step", "ms": round(dt * 1e3, 2),
                      "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
