"""Inference throughput of an exported serving artifact.

Measures end-to-end `.call` latency/throughput of a `scripts/export.py`
artifact on the attached accelerator, using the forced-fetch timing
pattern (see bench.py header — block_until_ready is unreliable through
the relay).

Usage:
    python scripts/export.py --checkpoint ckpt --output serve/
    python tools/bench_serving.py serve/ [--batch 1] [--steps 20]
Prints one JSON line: {"serving_ms_per_batch": ..., "frames_per_sec": ...}
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
    ap.add_argument("artifact")
    ap.add_argument("--batch", type=int, default=0,
                    help="override batch (dynamic-batch artifacts only); "
                         "0 = the exported signature's batch")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU platform (shorthand for "
                         "DRO_SFM_PLATFORM=cpu)")
    args = ap.parse_args()

    if args.cpu:
        os.environ["DRO_SFM_PLATFORM"] = "cpu"
    from dro_sfm_tpu.utils.misc import apply_platform_env
    apply_platform_env()
    import jax.numpy as jnp

    from dro_sfm_tpu.export_serving import META, load_serving_artifact

    with open(os.path.join(args.artifact, META)) as f:
        meta = json.load(f)
    sig = meta["signature"]
    b = args.batch or (1 if sig["target"][0] == "b" else sig["target"][0])
    h, w = sig["target"][1], sig["target"][2]
    n = sig["refs"][1]

    art = load_serving_artifact(args.artifact)
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.uniform(size=(b, h, w, 3)), jnp.float32)
    refs = jnp.asarray(rng.uniform(size=(b, n, h, w, 3)), jnp.float32)
    K = jnp.broadcast_to(jnp.asarray(
        [[w * 0.8, 0, (w - 1) / 2], [0, w * 0.8, (h - 1) / 2], [0, 0, 1.0]],
        jnp.float32), (b, 3, 3))

    t0 = time.perf_counter()
    depth, _ = art.call(target, refs, K)
    float(np.asarray(depth).ravel()[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(args.steps):
        depth, _ = art.call(target, refs, K)
    float(np.asarray(depth).ravel()[0])
    dt = (time.perf_counter() - t0) / args.steps
    print(json.dumps({
        "serving_ms_per_batch": round(dt * 1e3, 2),
        "frames_per_sec": round(b / dt, 2),
        "batch": b, "image_shape": [h, w], "views": n,
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
