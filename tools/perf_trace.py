"""Device-trace profile of the train step: top ops by total device time.

Captures a jax.profiler trace of a few train steps and aggregates the
XPlane device-op durations — the ground truth for what the refinement loop
actually spends time on (works on the axon-attached TPU as long as the
backend exports XPlanes).

Usage: python tools/perf_trace.py [--batch 4] [--steps 3] [--top 40]
       [--mixed-precision] [--remat] [--unroll none]
"""
import argparse
import collections
import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--mixed-precision", action="store_true")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--unroll", default="none")
    ap.add_argument("--warp", default="gather",
                    help="warp_impl: gather | matmul | pallas")
    ap.add_argument("--sep-conv", default="conv",
                    help="sep_conv: conv | matmul | pallas")
    args = ap.parse_args()

    import jax

    from tools.perf_ablate import make_batch
    from dro_sfm_tpu.models.sfm import SfmModelConfig
    from dro_sfm_tpu.training.state import create_train_state, make_optimizer
    from dro_sfm_tpu.training.step import make_train_step
    from dro_sfm_tpu.utils.config import load_config

    b, n, h, w = args.batch, 2, 192, 640
    batch = make_batch(b, n, h, w)
    model_cfg = SfmModelConfig(
        name="SupModelMF", version="it12-h-out", min_depth=0.2, max_depth=80.0,
        flip_lr_prob=0.0, mixed_precision=args.mixed_precision,
        remat=args.remat, scan_unroll=args.unroll, warp_impl=args.warp,
        sep_conv=args.sep_conv)
    net = model_cfg.build_net()
    cfg = load_config()
    tx = make_optimizer(cfg.model.optimizer, cfg.model.scheduler, 1000)
    state = create_train_state(
        net, jax.random.PRNGKey(0),
        {k: batch[k] for k in ("rgb", "rgb_context", "intrinsics")}, tx)
    train_step = make_train_step(model_cfg, net)
    rng = jax.random.PRNGKey(1)

    def fetch(s):
        return float(np.asarray(
            jax.tree_util.tree_leaves(s.params)[0]).ravel()[0])

    state, _ = train_step(state, batch, rng)  # compile
    fetch(state)

    logdir = tempfile.mkdtemp(prefix="jaxtrace_")
    jax.profiler.start_trace(logdir)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, _ = train_step(state, batch, rng)
    fetch(state)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(json.dumps({"wall_ms_per_step": round(wall / args.steps * 1e3, 2)}))

    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not files:
        print("NO XPLANE FILES under", logdir)
        return
    import re
    from jax.profiler import ProfileData
    opcode_re = re.compile(r"= (?:\(?[\w\[\]{}(),:/*\s]*?\)?\s)?(\w[\w-]*)\(")
    agg = collections.Counter()          # by opcode(+fusion kind)
    named = collections.Counter()        # by individual op (for top list)
    total_ns = 0
    for fn in files:
        with open(fn, "rb") as f:
            data = ProfileData.from_serialized_xspace(f.read())
        for plane in data.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            for line in plane.lines:
                if "XLA Ops" not in line.name:
                    continue
                for ev in line.events:
                    name = ev.name
                    m = opcode_re.search(name)
                    opcode = m.group(1) if m else name.split(" ")[0]
                    if opcode in ("while",):
                        continue  # container: body ops counted separately
                    if opcode == "fusion":
                        km = re.search(r"kind=(\w+)", name)
                        opcode = f"fusion.{km.group(1) if km else '?'}"
                        if "s32[" in name.split("fusion(")[-1][:120]:
                            opcode += ".idx"  # scatter/gather-ish operand
                    dur = ev.duration_ns
                    agg[opcode] += dur
                    named[name[:140]] += dur
                    total_ns += dur
    print(f"\nleaf device op time: {total_ns / 1e6 / args.steps:.1f} "
          f"ms/step over {args.steps} steps")
    print("\n== by opcode ==")
    for name, ns in agg.most_common(30):
        print(f"{ns / 1e6 / args.steps:9.3f} ms/step  {name}")
    print("\n== top individual ops ==")
    for name, ns in named.most_common(args.top):
        print(f"{ns / 1e6 / args.steps:9.3f} ms/step  {name}")


if __name__ == "__main__":
    main()
