"""Compare compiled Pallas tent-warp gradients against the gather path
ON DEVICE (the interpret-mode parity tests in tests/test_pallas_warp.py
only cover single-strip shapes on CPU).

Context (docs/convergence_selfsup_r5.md): the selfsup champion explodes
at step ~10; knob isolation implicated warp_impl="pallas" (fp32 +
scan + remat with only the warp swapped still explodes). This script
checks d_f1 / d_fref / d_coords parity for:
  * the test shape (h*w = 128, one 128-strip), and
  * the model shape (12x16 = 192 -> p_pad 256, TWO strips, C=128),
  * random coords and near-integer (init-regime) coords.

Usage: python tools/diag_warp_grad.py [--interpret]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true",
                    help="run the kernel through the Pallas interpreter")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dro_sfm_tpu.ops.pallas.tent_warp import pallas_warp_cost
    from dro_sfm_tpu.ops.resample import bilinear_sample

    print(f"backend={jax.default_backend()} interpret={args.interpret}")
    rng = np.random.default_rng(0)

    for (h, w, c, tag) in [(8, 16, 32, "1strip"), (12, 16, 128, "2strip"),
                           (24, 80, 128, "model192x640")]:
        b, n = 2, 2
        fmap1 = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
        fref = jnp.asarray(rng.normal(size=(b, n, h, w, c)), jnp.float32)
        weights = jnp.asarray(rng.normal(size=(b, n, h, w, c)), jnp.float32)
        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")
        grid = jnp.stack([gx, gy], axis=-1)[None, None]

        for coords, ctag in [
            (jnp.asarray(rng.uniform(-2, max(h, w) + 2,
                                     size=(b, n, h, w, 2)), jnp.float32),
             "random"),
            (jnp.broadcast_to(grid, (b, n, h, w, 2))
             + jnp.asarray(rng.normal(size=(b, n, h, w, 2)) * 1e-3,
                           jnp.float32), "near-integer"),
            (jnp.broadcast_to(grid, (b, n, h, w, 2)), "exact-integer"),
        ]:
            def loss_pallas(f1, fr, co):
                return jnp.sum(pallas_warp_cost(
                    f1, fr, co, interpret=args.interpret) * weights)

            def loss_gather(f1, fr, co):
                warped = bilinear_sample(fr, co)
                return jnp.sum(jnp.square(f1[:, None] - warped) * weights)

            gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(fmap1, fref, coords)
            gg = jax.grad(loss_gather, argnums=(0, 1, 2))(fmap1, fref, coords)
            for name, a, e in zip(("d_fmap1", "d_fref", "d_coords"), gp, gg):
                a = np.asarray(a)
                e = np.asarray(e)
                denom = max(np.abs(e).max(), 1e-8)
                print(f"{tag:14s} {ctag:13s} {name:8s} "
                      f"maxabs={np.abs(a - e).max():.3e} "
                      f"rel={np.abs(a - e).max() / denom:.3e} "
                      f"|pallas|={np.linalg.norm(a):.4g} "
                      f"|gather|={np.linalg.norm(e):.4g}")


if __name__ == "__main__":
    main()
