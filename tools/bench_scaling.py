"""Data-parallel weak-scaling benchmark of the jitted train step.

Runs the full supervised train step (forward + loss + backward + Adam,
batch sharded over the mesh ``data`` axis) at a FIXED per-device batch for
a sweep of device counts and reports per-step time, global frames/s, and
efficiency vs the single-device run — the measurement the north star asks
for ("near-linear frames/s scaling at 1 chip / 1 host / N hosts",
BASELINE.json). Gradient averaging is the implicit GSPMD psum inserted by
XLA, so what this measures is exactly the collective overhead growth.

On a real TPU slice this produces the scaling table. On the single-chip
dev environment it falls back to virtual CPU host-platform devices; those
share the machine's physical cores, so the CPU numbers validate the
*mechanics* (sharding compiles, executes, efficiency accounting) but are
explicitly flagged ``"simulated": true`` — shared-core throughput is not a
scaling measurement.

Usage:
    python tools/bench_scaling.py [--devices 1,2,4,8] [--per-device-batch 1]
        [--height 64] [--width 96] [--version it4-h-out] [--steps 5]
Prints one JSON line per device count.
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
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--per-device-batch", type=int, default=1)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--views", type=int, default=2)
    ap.add_argument("--version", default="it4-h-out")
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()
    counts = [int(c) for c in args.devices.split(",")]

    import jax

    # Decide real-vs-simulated from the *declared* topology WITHOUT touching
    # jax.devices(): the first backend query locks the platform in, after
    # which CPU host-platform forcing is ignored (and the axon sitecustomize
    # force-registers the tunneled TPU regardless of JAX_PLATFORMS).
    topo = os.environ.get("TPU_TOPOLOGY", "")
    real_chips = 1
    try:
        for d in topo.split("x"):
            real_chips *= int(d)
    except ValueError:
        real_chips = 1
    simulated = real_chips < max(counts)
    if simulated:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") +
            f" --xla_force_host_platform_device_count={max(counts)}").strip()
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    from dro_sfm_tpu.models.sfm import SfmModelConfig
    from dro_sfm_tpu.parallel.mesh import make_mesh, shard_batch
    from dro_sfm_tpu.training.state import create_train_state, make_optimizer
    from dro_sfm_tpu.training.step import make_train_step
    from dro_sfm_tpu.utils.config import load_config
    from tools.perf_ablate import make_batch

    h, w, n = args.height, args.width, args.views
    model_cfg = SfmModelConfig(
        name="SupModelMF", version=args.version, min_depth=0.2,
        max_depth=80.0, flip_lr_prob=0.0,
        mixed_precision=not simulated)  # bf16 on TPU, f32 on CPU sim
    net = model_cfg.build_net()
    cfg = load_config()
    tx = make_optimizer(cfg.model.optimizer, cfg.model.scheduler, 1000)
    base = None

    for nd in counts:
        devices = jax.devices()[:nd]
        if len(devices) < nd:
            print(json.dumps({"n_devices": nd, "skipped": "not enough"}))
            continue
        mesh = make_mesh(devices)
        b = args.per_device_batch * nd
        batch = make_batch(b, n, h, w)
        state = create_train_state(
            net, jax.random.PRNGKey(0),
            {k: batch[k] for k in ("rgb", "rgb_context", "intrinsics")}, tx)
        state = jax.device_put(state, NamedSharding(mesh, PartitionSpec()))
        batch = shard_batch(batch, mesh)
        train_step = make_train_step(model_cfg, net)
        rng = jax.random.PRNGKey(1)

        def fetch(s):
            return float(
                jax.tree_util.tree_leaves(s.params)[0].ravel()[0])

        t0 = time.perf_counter()
        state, _ = train_step(state, batch, rng)
        fetch(state)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, _ = train_step(state, batch, rng)
        fetch(state)
        step_ms = (time.perf_counter() - t0) / args.steps * 1e3
        fps = b / (step_ms * 1e-3)
        if base is None:
            base = fps / nd
        print(json.dumps({
            "n_devices": nd,
            "global_batch": b,
            "step_ms": round(step_ms, 2),
            "global_frames_per_sec": round(fps, 2),
            "efficiency_vs_1dev": round(fps / (base * nd), 3),
            "compile_s": round(compile_s, 1),
            "simulated": simulated,
        }), flush=True)


if __name__ == "__main__":
    main()
