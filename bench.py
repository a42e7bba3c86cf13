"""Benchmark harness: training throughput of the flagship configuration.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures frames/s of the full jitted training step (forward + supervised
loss + backward + Adam) for the flagship network (it12-h-out) at 192x640
with 2 context views — a standard KITTI benchmark resolution, fixed since
round 1 so the vs_baseline series stays comparable (the reference's own
KITTI recipe trains at 320x960 batch 2; see tools/perf_ablate.py for other
operating points). The model runs the
config-default fast path (bf16 network, fully-unrolled refinement scans —
tools/perf_ablate.py r2 sweep). The reference publishes no throughput
numbers, so ``vs_baseline`` compares against the round-1 fp32 measurement
recorded in BENCH_BASELINE.json (first run wrote it). The JSON line also
reports achieved TFLOP/s and MFU from XLA cost analysis against the
197 TFLOP/s bf16 peak of a v5e chip.
"""
import json
import os
import time

import numpy as np

PEAK_BF16_TFLOPS = 197.0  # TPU v5e per-chip peak
PEAK_HBM_GBPS = 819.0     # TPU v5e per-chip HBM bandwidth

# Static cost of the flagship train step. FLOPs from the EXACT jaxpr
# count (tools/flops_exact.py — every conv/dot equation with scan trip
# counts multiplied; rounds 1-3 used XLA cost_analysis, which charges a
# scanned refinement body once and lost conv FLOPs on the TPU lowering
# path, undercounting the step ~3.8x and reporting 8% MFU for what is a
# ~30%-MFU program). Verified to scale linearly in pixels (2.3387
# TFLOP/frame at 320x960 = exactly 2.5x the 192x640 figure). HBM bytes
# from the memory-space-aware walk of the POST-OPTIMIZATION TPU HLO
# (tools/perf_hbm.py). Per-frame so both scale with batch.
TFLOPS_PER_FRAME = 7.484 / 8        # tools/flops_exact.py --batch 8
FALLBACK_GB_PER_FRAME = 18.1 / 8

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")


def _probe_backend(timeout_s: float = 600.0):
    """Fail fast if the (remote-attached) backend never comes up.

    The axon relay can be unreachable for hours; `jax.devices()` then hangs
    indefinitely inside backend init, which would stall the whole bench
    harness. Probe it on a daemon thread with a hard deadline and exit
    with a diagnostic instead of hanging."""
    import sys
    import threading

    result = {}

    def probe():
        import jax
        try:
            result["devices"] = jax.devices()
        except Exception as e:               # noqa: BLE001 — diagnostic path
            result["error"] = repr(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" not in result:
        msg = result.get("error", f"backend init exceeded {timeout_s:.0f}s")
        print(f"bench.py: accelerator backend unavailable: {msg}",
              file=sys.stderr)
        sys.exit(3)


def measure(b, n, h, w, n_steps=20):
    """Compile + time the flagship train step at one operating point."""
    import jax
    import jax.numpy as jnp

    from dro_sfm_tpu.models.sfm import SfmModelConfig, resolve_memory_policy
    from dro_sfm_tpu.training.state import create_train_state, make_optimizer
    from dro_sfm_tpu.training.step import make_train_step
    from dro_sfm_tpu.utils.config import load_config

    rng = np.random.default_rng(0)
    K = np.array([[w * 0.8, 0, (w - 1) / 2], [0, w * 0.8, (h - 1) / 2],
                  [0, 0, 1.0]], dtype=np.float32)
    batch = {
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

    # "auto" knobs resolve per operating point: the no-remat fast path at
    # the primary 192x640 b8 point, remat above ~1.1M batch-pixels (e.g.
    # the reference KITTI point 320x960 b8, which OOMs without it).
    remat, scan_unroll = resolve_memory_policy("auto", "auto", b, (h, w))
    model_cfg = SfmModelConfig(name="SupModelMF", version="it12-h-out",
                               min_depth=0.2, max_depth=80.0,
                               flip_lr_prob=0.5,
                               mixed_precision=True, remat=remat,
                               scan_unroll=scan_unroll, warp_impl="pallas")
    net = model_cfg.build_net()
    cfg = load_config()
    tx = make_optimizer(cfg.model.optimizer, cfg.model.scheduler,
                        steps_per_epoch=1000)
    state = create_train_state(
        net, jax.random.PRNGKey(0),
        {k: batch[k] for k in ("rgb", "rgb_context", "intrinsics")}, tx)
    train_step = make_train_step(model_cfg, net)
    step_rng = jax.random.PRNGKey(1)

    # Warmup / compile. NOTE: on the remote-attached axon backend,
    # jax.block_until_ready does NOT reliably wait for device execution —
    # only a host fetch of data that depends on the computation does. All
    # timing anchors on an actual value fetch (validated to scale linearly
    # in step count).
    def fetch(s):
        return float(jax.tree_util.tree_leaves(s.params)[0].ravel()[0])

    state, metrics = train_step(state, batch, step_rng)
    fetch(state)

    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = train_step(state, batch, step_rng)
    fetch(state)
    dt = time.perf_counter() - t0

    frames_per_sec = b * n_steps / dt
    step_ms = dt / n_steps * 1e3

    # Record the RESOLVED knob set — "bench at the fast path" is
    # meaningless as evidence unless the artifact says exactly which
    # path that was (VERDICT r4 item 4).
    knobs = {"mixed_precision": model_cfg.mixed_precision,
             "warp_impl": model_cfg.warp_impl,
             "sep_conv": model_cfg.sep_conv,
             "remat": remat, "scan_unroll": scan_unroll}

    # Static model FLOPs: the audited per-frame constant scaled by pixels
    # (exact — tools/flops_exact.py; XLA cost_analysis is NOT consulted,
    # it undercounts scanned/TPU-lowered programs ~3.8x). HBM bytes from
    # the space-aware model, scaled by pixels from the audited b8 192x640
    # point.
    tflops = TFLOPS_PER_FRAME * b * (h * w) / (192 * 640)
    gbytes = FALLBACK_GB_PER_FRAME * b * (h * w) / (192 * 640)
    achieved = tflops / (step_ms * 1e-3)
    return {
        "frames_per_sec": frames_per_sec,
        "step_ms": step_ms,
        "tflops": tflops,
        "achieved_tflops_per_s": achieved,
        "mfu": achieved / PEAK_BF16_TFLOPS,
        "hbm_util": (gbytes / (step_ms * 1e-3)) / PEAK_HBM_GBPS,
        "knobs": knobs,
    }


def main():
    _probe_backend()
    import jax

    # Primary series: 192x640 b8, fixed since round 1 for comparability.
    r = measure(8, 2, 192, 640)
    # Reference operating point: the upstream KITTI recipe trains 320x960
    # (`/root/reference/configs/train_kitti_mf_gt.yaml:28-33`).
    ref_error = None
    try:
        r_ref = measure(8, 2, 320, 960)
    except Exception as e:  # OOM / compile failure must not kill the series
        print(f"bench.py: 320x960 point failed: {e!r}", file=__import__("sys").stderr)
        r_ref = None
        # Record the failure EXPLICITLY in the artifact — an absent field
        # reads as "never attempted" (round-3 lesson).
        msg = repr(e)
        ref_error = ("OOM: " + msg[:160] if "RESOURCE_EXHAUSTED" in msg
                     or "Out of memory" in msg else msg[:200])

    baseline = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f).get("train_frames_per_sec")
    else:
        with open(BASELINE_FILE, "w") as f:
            json.dump({"train_frames_per_sec": r["frames_per_sec"],
                       "device": str(jax.devices()[0])}, f)
    vs_baseline = r["frames_per_sec"] / baseline if baseline else 1.0

    out = {
        "metric": "train_frames_per_sec",
        "value": round(r["frames_per_sec"], 3),
        "unit": "frames/s (it12-h-out, 192x640, b8, supervised step; "
                "exact knob set in 'knobs')",
        "vs_baseline": round(vs_baseline, 3),
        "knobs": r["knobs"],
        "step_ms": round(r["step_ms"], 2),
        "step_tflops": round(r["tflops"], 3),
        "achieved_tflops_per_s": round(r["achieved_tflops_per_s"], 2),
        "mfu_vs_bf16_peak": round(r["mfu"], 4),
        "hbm_bw_utilization": round(r["hbm_util"], 4),
    }
    if r_ref is not None:
        # 2.5x the pixels; scaling_vs_pixels 1.0 = exactly linear in pixels.
        out.update({
            "frames_per_sec_320x960_b8": round(r_ref["frames_per_sec"], 3),
            "step_ms_320x960_b8": round(r_ref["step_ms"], 2),
            "scaling_vs_pixels_320x960": round(
                (r_ref["step_ms"] / r["step_ms"])
                / ((320 * 960) / (192 * 640)), 3),
            "knobs_320x960": r_ref["knobs"],
        })
    else:
        out["frames_per_sec_320x960_b8"] = ref_error
    print(json.dumps(out))


if __name__ == "__main__":
    main()
