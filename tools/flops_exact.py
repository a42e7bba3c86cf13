"""Exact model-FLOP count of the train step from the jaxpr.

XLA ``cost_analysis`` undercounts this program two ways: with scanned
refinement it charges each scan BODY once (not x length), and the
TPU/axon lowering path loses conv FLOPs entirely (round-3's
1.98 TFLOP/step figure — the GRU convs alone exceed it). This tool
counts at the jaxpr level, BEFORE any backend lowering: every
``conv_general_dilated`` and ``dot_general`` equation (forward and
backward — the traced step includes the grad), descending into
pjit/closed-call/scan sub-jaxprs with scans multiplied by their trip
count. Pallas custom calls count as zero — model FLOPs treat sampling
as a gather; the tent-matmul formulation's in-kernel FLOPs are an
implementation choice charged to the implementation, not the model.

Usage: JAX_PLATFORMS=cpu python tools/flops_exact.py [--batch 8]
       [--image-shape 192 640] [--per-op]
"""
from __future__ import annotations

import argparse
import math
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def count_jaxpr(jaxpr, mult: float, agg: Counter) -> None:
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "conv_general_dilated":
            out = eqn.outvars[0].aval.shape
            lhs = eqn.invars[0].aval.shape
            rhs = eqn.invars[1].aval.shape
            dn = eqn.params["dimension_numbers"]
            groups = (eqn.params.get("feature_group_count", 1)
                      * eqn.params.get("batch_group_count", 1))
            # out = [N, spatial..., Cout] per dn.out_spec; kernel spatial
            # dims from rhs minus (in, out) feature dims.
            out_elems = math.prod(out)
            k_spatial = math.prod(rhs[i] for i in dn.rhs_spec[2:])
            cin = rhs[dn.rhs_spec[1]]
            agg[f"conv{tuple(rhs[i] for i in dn.rhs_spec[2:])}"] += (
                2.0 * out_elems * k_spatial * cin / groups * mult)
        elif prim == "dot_general":
            (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
            lhs = eqn.invars[0].aval.shape
            rhs = eqn.invars[1].aval.shape
            batch = math.prod(lhs[i] for i in lb)
            k = math.prod(lhs[i] for i in lc)
            m = math.prod(lhs[i] for i in range(len(lhs))
                          if i not in set(lc) | set(lb))
            n = math.prod(rhs[i] for i in range(len(rhs))
                          if i not in set(rc) | set(rb))
            agg["dot_general"] += 2.0 * batch * m * n * k * mult
        elif prim == "scan":
            count_jaxpr(eqn.params["jaxpr"].jaxpr,
                        mult * eqn.params["length"], agg)
        elif prim == "while":
            # Not used on the hot path; charge one trip (loud if it ever
            # matters).
            count_jaxpr(eqn.params["body_jaxpr"].jaxpr, mult, agg)
        else:
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                sub = eqn.params.get(key)
                if sub is not None:
                    count_jaxpr(getattr(sub, "jaxpr", sub), mult, agg)


def step_flops(b=8, n=2, h=192, w=640, mixed=True, unroll="none",
               version="it12-h-out"):
    """Total train-step model FLOPs at an operating point."""
    import jax

    from tools.perf_ablate import make_batch
    from dro_sfm_tpu.models.sfm import SfmModelConfig
    from dro_sfm_tpu.training.state import create_train_state, make_optimizer
    from dro_sfm_tpu.training.step import make_train_step
    from dro_sfm_tpu.utils.config import load_config

    batch = make_batch(b, n, h, w)
    # warp_impl="gather": model-FLOP accounting (sampling = gather = 0
    # FLOPs); scans NOT unrolled keeps the jaxpr small — the scan
    # multiplier handles trip counts exactly.
    model_cfg = SfmModelConfig(
        name="SupModelMF", version=version, min_depth=0.2, max_depth=80.0,
        flip_lr_prob=0.0, mixed_precision=mixed, remat=False,
        scan_unroll=unroll, warp_impl="gather")
    net = model_cfg.build_net()
    cfg = load_config()
    tx = make_optimizer(cfg.model.optimizer, cfg.model.scheduler, 1000)
    state = create_train_state(
        net, jax.random.PRNGKey(0),
        {k: batch[k] for k in ("rgb", "rgb_context", "intrinsics")}, tx)
    train_step = make_train_step(model_cfg, net)
    jaxpr = jax.make_jaxpr(
        lambda s, bt, r: train_step(s, bt, r))(state, batch,
                                               jax.random.PRNGKey(1))
    agg = Counter()
    count_jaxpr(jaxpr.jaxpr, 1.0, agg)
    return agg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--views", type=int, default=2)
    ap.add_argument("--image-shape", type=int, nargs=2, default=(192, 640))
    ap.add_argument("--per-op", action="store_true")
    ap.add_argument("--step-ms", type=float, default=0.0)
    args = ap.parse_args()

    from dro_sfm_tpu.utils.misc import apply_platform_env
    apply_platform_env()

    agg = step_flops(args.batch, args.views, *args.image_shape)
    total = sum(agg.values())
    import json
    out = {"batch": args.batch, "image_shape": args.image_shape,
           "train_step_tflops": round(total / 1e12, 3),
           "tflops_per_frame": round(total / 1e12 / args.batch, 4)}
    if args.step_ms > 0:
        ach = total / (args.step_ms * 1e-3) / 1e12
        out["achieved_tflops_per_s"] = round(ach, 1)
        out["mfu_vs_bf16_197"] = round(ach / 197.0, 3)
    print(json.dumps(out))
    if args.per_op:
        for k, v in sorted(agg.items(), key=lambda kv: -kv[1]):
            print(f"{v / 1e12:8.3f} T  {k}")


if __name__ == "__main__":
    main()
