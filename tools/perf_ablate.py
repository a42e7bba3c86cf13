"""On-device perf ablation of the training step.

Times the full jitted train step (forward + loss + backward + Adam) for a
grid of perf-knob variants — mixed_precision (bf16 convs), warp_impl
(gather vs dense-matmul sampler), remat (recompute refinement steps in the
backward) — at the flagship operating point (it12-h-out, 192x640, KITTI
supervised). One process, variants sequential: the axon-attached TPU
serializes concurrent processes and corrupts timings.

Timing uses the forced-fetch pattern: on this backend
``jax.block_until_ready`` does not reliably wait for device execution, so
every timing loop anchors on a host fetch of a value derived from the
computation (see bench.py).

Usage:  python tools/perf_ablate.py [--batch 4] [--steps 20] [--out FILE]
Writes one JSON line per variant to stdout and to --out (default
results/perf_ablate.jsonl).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_batch(b, n, h, w):
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    K = np.array([[w * 0.8, 0, (w - 1) / 2], [0, w * 0.8, (h - 1) / 2],
                  [0, 0, 1.0]], dtype=np.float32)
    return {
        "rgb": jnp.asarray(rng.uniform(size=(b, h, w, 3)), jnp.float32),
        "rgb_context": jnp.asarray(
            rng.uniform(size=(b, n, h, w, 3)), jnp.float32),
        "rgb_original": jnp.asarray(
            rng.uniform(size=(b, h, w, 3)), jnp.float32),
        "rgb_context_original": jnp.asarray(
            rng.uniform(size=(b, n, h, w, 3)), jnp.float32),
        "intrinsics": jnp.broadcast_to(jnp.asarray(K), (b, 3, 3)),
        "depth": jnp.asarray(
            rng.uniform(1.0, 60.0, size=(b, h, w, 1)), jnp.float32),
        "pose_context": jnp.broadcast_to(
            jnp.eye(4, dtype=jnp.float32), (b, n, 4, 4)),
    }


def time_variant(name, batch, b, n_steps, *, mixed_precision, warp_impl,
                 remat, version="it12-h-out", scan_unroll="none",
                 sep_conv="conv"):
    import jax

    from dro_sfm_tpu.models.sfm import SfmModelConfig
    from dro_sfm_tpu.training.state import create_train_state, make_optimizer
    from dro_sfm_tpu.training.step import make_train_step
    from dro_sfm_tpu.utils.config import load_config

    model_cfg = SfmModelConfig(
        name="SupModelMF", version=version, min_depth=0.2,
        max_depth=80.0, flip_lr_prob=0.5, mixed_precision=mixed_precision,
        warp_impl=warp_impl, remat=remat, scan_unroll=scan_unroll,
        sep_conv=sep_conv)
    net = model_cfg.build_net()
    cfg = load_config()
    tx = make_optimizer(cfg.model.optimizer, cfg.model.scheduler,
                        steps_per_epoch=1000)
    state = create_train_state(
        net, jax.random.PRNGKey(0),
        {k: batch[k] for k in ("rgb", "rgb_context", "intrinsics")}, tx)
    train_step = make_train_step(model_cfg, net)
    step_rng = jax.random.PRNGKey(1)

    def fetch(s):
        return float(jax.tree_util.tree_leaves(s.params)[0].ravel()[0])

    t0 = time.perf_counter()
    state, metrics = train_step(state, batch, step_rng)
    fetch(state)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = train_step(state, batch, step_rng)
    fetch(state)
    dt = time.perf_counter() - t0
    loss = float(metrics["loss"])

    rec = {
        "variant": name, "batch": b, "version": version,
        "mixed_precision": mixed_precision, "warp_impl": warp_impl,
        "remat": remat, "scan_unroll": scan_unroll, "sep_conv": sep_conv,
        "step_ms": round(dt / n_steps * 1e3, 2),
        "frames_per_sec": round(b * n_steps / dt, 2),
        "compile_s": round(compile_s, 1),
        "loss": round(loss, 4),
    }
    # free device buffers before the next variant
    del state, train_step
    return rec


VARIANTS = [
    # name -> overrides of time_variant kwargs (+ optional "batch")
    ("fp32-gather-remat", dict(mixed_precision=False, remat=True)),
    ("fp32-gather", dict(mixed_precision=False)),
    ("bf16-gather", dict()),
    ("bf16-matmul", dict(warp_impl="matmul")),
    ("bf16-gather-remat", dict(remat=True)),
    ("fp32-matmul", dict(mixed_precision=False, warp_impl="matmul")),
    # decomposition sweep: refinement-iteration count and batch scaling
    ("bf16-it0", dict(version="it0-h-out")),
    ("bf16-it4", dict(version="it4-h-out")),
    ("bf16-it8", dict(version="it8-h-out")),
    ("bf16-b8", dict(batch=8)),
    ("bf16-b16-remat", dict(batch=16, remat=True)),
    ("bf16-b8-remat", dict(batch=8, remat=True)),
    # scan unrolling: cross-step fusion in the refinement loop
    ("bf16-unroll-inner", dict(scan_unroll="inner")),
    ("bf16-unroll-full", dict(scan_unroll="full")),
    ("bf16-b16-unroll-full", dict(batch=16, scan_unroll="full")),
    ("bf16-b8-unroll-full", dict(batch=8, scan_unroll="full")),
    ("bf16-unroll-full-matmul", dict(scan_unroll="full", warp_impl="matmul")),
    ("bf16-unroll-full-pallas", dict(scan_unroll="full", warp_impl="pallas")),
    ("fp32-unroll-full", dict(mixed_precision=False, scan_unroll="full")),
    ("bf16-b8-unroll-full-matmul", dict(batch=8, scan_unroll="full",
                                        warp_impl="matmul")),
    ("bf16-b8-unroll-inner-matmul", dict(batch=8, scan_unroll="inner",
                                         warp_impl="matmul")),
    ("bf16-b8-unroll-full-pallas", dict(batch=8, scan_unroll="full",
                                        warp_impl="pallas")),
    ("bf16-b16-unroll-full-matmul", dict(batch=16, scan_unroll="full",
                                         warp_impl="matmul")),
    ("bf16-b8-unroll-full-pallas-remat", dict(batch=8, scan_unroll="full",
                                              warp_impl="pallas",
                                              remat=True)),
    ("bf16-b12-unroll-full-pallas", dict(batch=12, scan_unroll="full",
                                         warp_impl="pallas")),
    # champion-config iteration sweep: fixed cost vs per-refinement-
    # iteration cost at the shipped defaults (docs/perf_notes_r3.md)
    ("champ-it0", dict(batch=8, version="it0-h-out", scan_unroll="full",
                       warp_impl="pallas")),
    ("champ-it4", dict(batch=8, version="it4-h-out", scan_unroll="full",
                       warp_impl="pallas")),
    ("champ-it8", dict(batch=8, version="it8-h-out", scan_unroll="full",
                       warp_impl="pallas")),
    ("champ-it12", dict(batch=8, scan_unroll="full", warp_impl="pallas")),
    # separable-conv formulation A/B: lax conv vs tap-stacked im2col matmul
    ("champ-it12-sepmm", dict(batch=8, scan_unroll="full",
                              warp_impl="pallas", sep_conv="matmul")),
    # fused single-dispatch Pallas GRU pass (ops/pallas/gru_pass.py)
    ("champ-it12-grupallas", dict(batch=8, scan_unroll="full",
                                  warp_impl="pallas", sep_conv="pallas")),
    # concat-free split-kernel GRU convs (kills the pre-conv layout copy)
    ("champ-it12-sepsplit", dict(batch=8, scan_unroll="full",
                                 warp_impl="pallas", sep_conv="split")),
    # 320x960 selective-remat sweep (VERDICT r4 item 3): run with
    # --image-shape 320 960. Full step remat vs save_named policy
    # (keep cost maps + GRU states, recompute glue) x scan vs unroll.
    ("ref-remat-steps", dict(batch=8, scan_unroll="full",
                             warp_impl="pallas", sep_conv="split",
                             remat=True)),
    ("ref-remat-saved", dict(batch=8, scan_unroll="full",
                             warp_impl="pallas", sep_conv="split",
                             remat="save_named")),
    ("ref-remat-steps-scan", dict(batch=8, scan_unroll="none",
                                  warp_impl="pallas", sep_conv="split",
                                  remat=True)),
    ("ref-remat-saved-scan", dict(batch=8, scan_unroll="none",
                                  warp_impl="pallas", sep_conv="split",
                                  remat="save_named")),
    ("ref-noremat", dict(batch=8, scan_unroll="full",
                         warp_impl="pallas", sep_conv="split",
                         remat=False)),
    ("ref-noremat-b4", dict(batch=4, scan_unroll="full",
                            warp_impl="pallas", sep_conv="split",
                            remat=False)),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--views", type=int, default=2)
    ap.add_argument("--out", default="results/perf_ablate.jsonl")
    ap.add_argument("--only", default="",
                    help="comma-separated variant names to run")
    ap.add_argument("--image-shape", type=int, nargs=2, default=(192, 640),
                    metavar=("H", "W"),
                    help="operating-point resolution (reference KITTI "
                         "recipe: 320 960)")
    args = ap.parse_args()

    n, (h, w) = args.views, args.image_shape
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)

    only = set(filter(None, args.only.split(",")))
    batches = {}
    defaults = dict(mixed_precision=True, warp_impl="gather", remat=False,
                    version="it12-h-out", scan_unroll="none")
    for name, overrides in VARIANTS:
        if only and name not in only:
            continue
        kw = {**defaults, **overrides}
        b = kw.pop("batch", None) or args.batch
        if b not in batches:
            batches[b] = make_batch(b, n, h, w)
        try:
            rec = time_variant(name, batches[b], b, args.steps, **kw)
        except Exception as e:  # OOM etc. — record and continue
            rec = {"variant": name, "batch": b, "error": repr(e)[:300]}
        line = json.dumps(rec)
        print(line, flush=True)
        with open(args.out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
