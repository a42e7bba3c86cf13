"""Real-device Pallas lowering smoke: catch Mosaic-only failures early.

The CPU test suite runs every Pallas kernel in ``interpret=True`` mode,
which validates numerics but NOT the Mosaic TPU lowering rules (block
shapes whose last two dims must be (8,128)-divisible or match the array).
A kernel can therefore pass the whole suite and still crash the first
real train step — exactly what happened when the warp backward's
coordinate-gradient outputs moved to per-strip ``(1, 128)`` blocks over a
``(16, 1920)`` array.

This tool jits forward AND backward of every Pallas entry point in real
(non-interpret) mode on the attached device, across the shape classes the
framework actually hits:

* tile-multiple and padded (non-multiple) ``h*w``;
* batch*views counts that are 8-divisible, odd, and 1;
* bf16 and f32 feature dtypes.

Run it after ANY kernel edit, before trusting the suite:
    python tools/tpu_smoke.py            # full matrix (~minutes: compiles)
    python tools/tpu_smoke.py --fast     # one case per entry point

Exits non-zero on the first failing case with the lowering error.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cases(fast: bool):
    # (bn, h, w, ch, n_views, dtype_name)
    yield (16, 24, 80, 128, 2, "bfloat16")   # champion train shapes
    if fast:
        return
    yield (2, 24, 80, 128, 2, "float32")     # b1 eval, f32
    yield (3, 6, 10, 16, 3, "float32")       # odd bn, padded h*w
    yield (1, 8, 16, 32, 1, "bfloat16")      # single view, exact tile


def run_case(bn, h, w, ch, n, dtype_name):
    import jax
    import jax.numpy as jnp

    from dro_sfm_tpu.ops.pallas.tent_warp import pallas_warp_cost, tent_warp

    dtype = jnp.dtype(dtype_name)
    rng = np.random.default_rng(0)
    b = bn // n if bn % n == 0 else bn
    n_eff = n if bn % n == 0 else 1
    fmap1 = jnp.asarray(rng.normal(size=(b, h, w, ch)), dtype)
    fref = jnp.asarray(rng.normal(size=(b, n_eff, h, w, ch)), dtype)
    coords = jnp.asarray(
        rng.uniform(-2.0, max(h, w) + 2.0, size=(b, n_eff, h, w, 2)),
        jnp.float32)

    @jax.jit
    def cost_fwd_bwd(fmap1, fref, coords):
        def loss(fmap1, fref, coords):
            return pallas_warp_cost(fmap1, fref, coords).astype(
                jnp.float32).sum()
        return jax.value_and_grad(loss, argnums=(0, 1, 2))(
            fmap1, fref, coords)

    val, grads = cost_fwd_bwd(fmap1, fref, coords)
    jax.block_until_ready((val, grads))
    assert np.isfinite(float(val)), f"non-finite cost {val}"

    # Bare tent_warp entry (P must be a TILE multiple for this one).
    p = -(-(h * w) // 128) * 128
    flat_coords = jnp.asarray(
        rng.uniform(0.0, min(h, w) - 1.0, size=(b, p, 2)), jnp.float32)

    @jax.jit
    def warp_fwd_bwd(feat, co):
        def loss(feat, co):
            return tent_warp(feat, co).astype(jnp.float32).sum()
        return jax.value_and_grad(loss, argnums=(0, 1))(feat, co)

    val2, _ = warp_fwd_bwd(fmap1, flat_coords)
    jax.block_until_ready(val2)
    assert np.isfinite(float(val2)), f"non-finite warp sum {val2}"


def _gru_cases(fast: bool):
    # (b, h, w, d, cx, dtype_name)
    yield (8, 24, 80, 128, 160, "bfloat16")   # champion depth-branch shapes
    if fast:
        return
    yield (16, 24, 80, 128, 160, "bfloat16")  # pose branch (chunked grid)
    yield (3, 6, 10, 32, 24, "float32")       # odd batch, padded tiles
    yield (1, 8, 16, 32, 24, "float32")       # single element


def run_gru_case(b, h, w, d, cx, dtype_name):
    import jax
    import jax.numpy as jnp

    from dro_sfm_tpu.ops.pallas.gru_pass import K_TAPS, gru_sep1d_pass

    dtype = jnp.dtype(dtype_name)
    rng = np.random.default_rng(0)
    c1 = d + cx
    hid = jnp.asarray(rng.normal(size=(b, h, w, d)), dtype)
    x = jnp.asarray(rng.normal(size=(b, h, w, cx)), dtype)
    wzr = jnp.asarray(rng.normal(size=(K_TAPS, c1, 2 * d)) * 0.05,
                      jnp.float32)
    wq = jnp.asarray(rng.normal(size=(K_TAPS, c1, d)) * 0.05, jnp.float32)
    bzr = jnp.zeros((2 * d,), jnp.float32)
    bq = jnp.zeros((d,), jnp.float32)

    # Both directional passes, forward AND backward, compiled (Mosaic).
    @jax.jit
    def fwd_bwd(hid, x, wzr, bzr, wq, bq):
        def loss(hid, x, wzr, bzr, wq, bq):
            y = gru_sep1d_pass(hid, x, wzr, bzr, wq, bq, 2)
            y = gru_sep1d_pass(y, x, wzr, bzr, wq, bq, 1)
            return y.astype(jnp.float32).sum()
        return jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4, 5))(
            hid, x, wzr, bzr, wq, bq)

    val, grads = fwd_bwd(hid, x, wzr, bzr, wq, bq)
    jax.block_until_ready((val, grads))
    assert np.isfinite(float(val)), f"non-finite gru sum {val}"


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--fast", action="store_true",
                    help="one case per entry point")
    args = ap.parse_args()

    import jax
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}",
          flush=True)
    if jax.default_backend() not in ("tpu", "axon"):
        print("WARNING: no TPU attached — this exercises the interpret-free "
              "path on the current backend only; Mosaic rules are NOT "
              "checked on CPU.", flush=True)

    failures = 0
    for case in _cases(args.fast):
        t0 = time.time()
        try:
            run_case(*case)
            print(f"ok   warp {case}  ({time.time() - t0:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            failures += 1
            print(f"FAIL warp {case}: {type(e).__name__}: {e}", flush=True)
    for case in _gru_cases(args.fast):
        t0 = time.time()
        try:
            run_gru_case(*case)
            print(f"ok   gru  {case}  ({time.time() - t0:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            failures += 1
            print(f"FAIL gru  {case}: {type(e).__name__}: {e}", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
