"""Static FLOPs / dtype audit of the train step (runs on CPU — no TPU
needed: lowering and cost analysis are host-side).

Reports:
  * total FLOPs of the jitted train step from XLA ``cost_analysis`` and the
    derived MFU at a given measured step time (``--step-ms``);
  * a convolution census from the optimized HLO: op count and FLOPs grouped
    by operand dtype — the fastest way to catch fp32 convs surviving in
    ``mixed_precision`` mode.

Usage: JAX_PLATFORMS=cpu python tools/perf_flops.py [--batch 4]
       [--mixed-precision] [--remat] [--step-ms 117.6]
"""
import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# TPU v5e (v5 lite) peak per chip.
PEAK_TFLOPS = {"bf16": 197.0, "f32": 49.0}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--views", type=int, default=2)
    ap.add_argument("--mixed-precision", action="store_true")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--step-ms", type=float, default=0.0)
    args = ap.parse_args()

    import jax

    from tools.perf_ablate import make_batch
    from dro_sfm_tpu.models.sfm import SfmModelConfig
    from dro_sfm_tpu.training.state import create_train_state, make_optimizer
    from dro_sfm_tpu.training.step import make_train_step
    from dro_sfm_tpu.utils.config import load_config

    b, n, h, w = args.batch, args.views, 192, 640
    batch = make_batch(b, n, h, w)
    model_cfg = SfmModelConfig(
        name="SupModelMF", version="it12-h-out", min_depth=0.2, max_depth=80.0,
        flip_lr_prob=0.0, mixed_precision=args.mixed_precision,
        remat=args.remat)
    net = model_cfg.build_net()
    cfg = load_config()
    tx = make_optimizer(cfg.model.optimizer, cfg.model.scheduler, 1000)
    state = create_train_state(
        net, jax.random.PRNGKey(0),
        {k: batch[k] for k in ("rgb", "rgb_context", "intrinsics")}, tx)
    train_step = make_train_step(model_cfg, net)
    lowered = train_step.lower(state, batch, jax.random.PRNGKey(1))
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))

    # Convolution census from the optimized HLO.
    hlo = compiled.as_text()
    conv_re = re.compile(r"(\w+)\[[^\]]*\][^=]*= convolution\(")
    by_dtype = {}
    for m in conv_re.finditer(hlo):
        by_dtype[m.group(1)] = by_dtype.get(m.group(1), 0) + 1

    out = {
        "batch": b, "mixed_precision": args.mixed_precision,
        "remat": args.remat,
        "train_step_tflops": round(flops / 1e12, 3),
        "conv_count_by_out_dtype": by_dtype,
        "bytes_accessed_gb": round(
            float(cost.get("bytes accessed", 0.0)) / 2 ** 30, 2),
    }
    if args.step_ms > 0:
        eff_tflops = flops / (args.step_ms * 1e-3) / 1e12
        out["achieved_tflops"] = round(eff_tflops, 1)
        key = "bf16" if args.mixed_precision else "f32"
        out["mfu_vs_" + key] = round(eff_tflops / PEAK_TFLOPS[key], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
