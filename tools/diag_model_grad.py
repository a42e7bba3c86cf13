"""Full-model gradient comparison across warp implementations on a REAL
synthetic training batch (docs/convergence_selfsup_r5.md).

The kernel-level parity probe (tools/diag_warp_grad.py) shows 1e-7
agreement between the Pallas tent-warp and the gather path, yet the
selfsup training run explodes with warp_impl="pallas" and stays clean
with "gather". This tool takes the comparison to the exact regime the
trainer sees: SelfSupModelMF at init (seed 0), the first real training
batch, fp32, remat+scan (the diag_pallas configuration), and prints
per-top-level-module gradient norms / max relative differences, plus an
optional multi-step loss trajectory on the repeated batch.

Usage: python tools/diag_model_grad.py [--steps 0] [--impls gather,pallas]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def get_batch():
    from types import SimpleNamespace

    from dro_sfm_tpu.data import setup_dataset
    from dro_sfm_tpu.data.loader import DataLoader

    section = SimpleNamespace(
        dataset=["Synthetic"], path=["0"], split=["128"], repeat=[1],
        back_context=1, forward_context=1, cameras=[[]])
    aug = SimpleNamespace(image_shape=(96, 128), jittering=())
    ds = setup_dataset(section, aug, "train")
    loader = DataLoader(ds, batch_size=8, shuffle=True, seed=42,
                        drop_last=True)
    loader.set_epoch(0)
    return next(iter(loader))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=0,
                    help="also run N train steps on the repeated batch")
    ap.add_argument("--impls", default="gather,pallas")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dro_sfm_tpu.models.sfm import SfmModelConfig, forward_and_loss
    from dro_sfm_tpu.training.state import create_train_state, make_optimizer
    from dro_sfm_tpu.training.step import make_train_step
    from dro_sfm_tpu.utils.config import load_config

    batch = {k: jnp.asarray(v) for k, v in get_batch().items()
             if not isinstance(v, (list, tuple))}
    print("batch keys:", sorted(batch.keys()))

    grads = {}
    impls = args.impls.split(",")
    for impl in impls:
        model_cfg = SfmModelConfig(
            name="SelfSupModelMF", version="it12-h-out", min_depth=0.2,
            max_depth=20.0, flip_lr_prob=0.0, mixed_precision=False,
            warp_impl=impl, remat=True, scan_unroll="none")
        net = model_cfg.build_net()
        cfg = load_config()
        tx = make_optimizer(cfg.model.optimizer, cfg.model.scheduler, 256)
        state = create_train_state(
            net, jax.random.PRNGKey(42),
            {k: batch[k] for k in ("rgb", "rgb_context", "intrinsics")}, tx)

        def loss_fn(params, state=state, model_cfg=model_cfg, net=net):
            variables = {"params": params, "batch_stats": state.batch_stats}
            loss, _ = forward_and_loss(model_cfg, net, variables, batch,
                                       jax.random.PRNGKey(7))
            return loss

        loss, g = jax.jit(jax.value_and_grad(loss_fn))(state.params)
        g = jax.device_get(g)
        grads[impl] = g
        gn = float(np.sqrt(sum(float((np.asarray(x, np.float64) ** 2).sum())
                               for x in jax.tree_util.tree_leaves(g))))
        print(f"impl={impl:7s} loss={float(loss):.6f} grad_norm={gn:.6g}")

        if args.steps > 0:
            train_step = make_train_step(model_cfg, net)
            rng = jax.random.PRNGKey(7)
            losses = []
            for i in range(args.steps):
                rng, sk = jax.random.split(rng)
                state, metrics = train_step(state, batch, sk)
                losses.append(float(metrics["loss"]))
            print(f"  {impl} loss trajectory:",
                  " ".join(f"{x:.4f}" for x in losses))

    ref_impl = impls[0]
    flat_ref = jax.tree_util.tree_flatten_with_path(grads[ref_impl])[0]
    for impl in impls[1:]:
        flat = jax.tree_util.tree_flatten_with_path(grads[impl])[0]
        print(f"--- {impl} vs {ref_impl} per-leaf max-rel (top 15) ---")
        rows = []
        for (path, a), (_, e) in zip(flat, flat_ref):
            a = np.asarray(a, np.float64)
            e = np.asarray(e, np.float64)
            denom = max(np.abs(e).max(), 1e-12)
            rows.append((np.abs(a - e).max() / denom,
                         np.abs(e).max(),
                         jax.tree_util.keystr(path)))
        rows.sort(reverse=True)
        for rel, mag, name in rows[:15]:
            print(f"  rel={rel:10.3e} |ref|max={mag:10.3e}  {name}")
        dot = sum(float((np.asarray(a, np.float64)
                         * np.asarray(e, np.float64)).sum())
                  for (_, a), (_, e) in zip(flat, flat_ref))
        na = np.sqrt(sum(float((np.asarray(a, np.float64) ** 2).sum())
                         for _, a in flat))
        ne = np.sqrt(sum(float((np.asarray(e, np.float64) ** 2).sum())
                         for _, e in flat_ref))
        print(f"  cosine({impl},{ref_impl}) = {dot / (na * ne):.8f}")


if __name__ == "__main__":
    main()
