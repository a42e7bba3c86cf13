"""Per-component DEVICE-TIME attribution of the train step.

`tools/perf_trace.py` gives per-op durations but HLO instruction names
(%fusion.123) say nothing about which model component an op belongs to;
`tools/perf_hbm.py` attributes HBM *bytes* by the jax scope in each op's
``op_name`` metadata but knows nothing about time. This tool joins the
two: it compiles the step once, builds the instruction -> (opcode,
op_name, component) map from the post-optimization HLO, captures a
jax.profiler trace of a few steps, and aggregates leaf device-op
durations per component with a fwd/bwd split.

Async ops (copy-start/slice-start DMAs) are attributed to the component
of their op_name when present, else to ``data_movement``; their durations
include in-flight (overlapped) time, so the async columns bound — not
equal — the wall-time they cost. Compute fusions are the hard floor.

Usage: python tools/perf_attr.py [--batch 8] [--steps 3]
       [--sep-conv conv] [--warp pallas] [--top 12]
"""
import argparse
import collections
import glob
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_INSTR_HEAD = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=")
_OPCODE = re.compile(r"=\s*(?:\([^)]*\)|[\w\[\]{},:()#\s*]+?)\s+([\w\-]+)\(")
_OPNAME = re.compile(r'op_name="([^"]+)"')
_EV_NAME = re.compile(r"^%?([\w.\-]+)")


def build_instr_map(hlo_text: str):
    """Every instruction in every computation -> (opcode, op_name)."""
    from tools.perf_hbm import component_of

    table = {}
    for line in hlo_text.splitlines():
        mi = _INSTR_HEAD.match(line)
        if not mi:
            continue
        name = mi.group(1)
        mo = _OPCODE.search(line)
        opcode = mo.group(1) if mo else "?"
        op_name = (_OPNAME.search(line) or [None, ""])[1]
        table[name] = (opcode, op_name, component_of(op_name, opcode))
    return table


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=14)
    ap.add_argument("--unroll", default="full")
    ap.add_argument("--warp", default="pallas")
    ap.add_argument("--sep-conv", default="conv")
    ap.add_argument("--fp32", action="store_true")
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
        name="SupModelMF", version="it12-h-out", min_depth=0.2,
        max_depth=80.0, flip_lr_prob=0.0,
        mixed_precision=not args.fp32, remat=False,
        scan_unroll=args.unroll, warp_impl=args.warp,
        sep_conv=args.sep_conv)
    net = model_cfg.build_net()
    cfg = load_config()
    tx = make_optimizer(cfg.model.optimizer, cfg.model.scheduler, 1000)
    state = create_train_state(
        net, jax.random.PRNGKey(0),
        {k: batch[k] for k in ("rgb", "rgb_context", "intrinsics")}, tx)
    train_step = make_train_step(model_cfg, net)
    rng = jax.random.PRNGKey(1)

    lowered = train_step.lower(state, batch, rng)
    compiled = lowered.compile()
    hlo = compiled.runtime_executable().hlo_modules()[0].to_string()
    table = build_instr_map(hlo)
    print(f"instr map: {len(table)} instructions", flush=True)

    def fetch(s):
        return float(np.asarray(
            jax.tree_util.tree_leaves(s.params)[0]).ravel()[0])

    state, _ = train_step(state, batch, rng)
    fetch(state)

    logdir = tempfile.mkdtemp(prefix="jaxattr_")
    jax.profiler.start_trace(logdir)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, _ = train_step(state, batch, rng)
    fetch(state)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()

    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    from jax.profiler import ProfileData
    # Plain `copy` / `dynamic-slice` are SYNCHRONOUS layout/data moves —
    # real wall time, attributed with compute. Only *-start/-done pairs
    # overlap.
    ASYNC = ("copy-start", "slice-start", "async-start", "copy-done",
             "async-done")
    sync_by_comp = collections.Counter()
    async_by_comp = collections.Counter()
    unmatched = collections.Counter()
    copy_ops = collections.Counter()      # individual sync copies w/ op_name
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
                    m = _EV_NAME.match(ev.name)
                    if not m:
                        continue
                    instr = m.group(1)
                    opcode, op_name, comp = table.get(
                        instr, ("?", "", "unmapped"))
                    if opcode == "while":
                        continue
                    dur = ev.duration_ns
                    if comp == "unmapped":
                        unmatched[instr[:60]] += dur
                    bucket = async_by_comp if opcode in ASYNC else sync_by_comp
                    key = comp if comp != "unmapped" else f"unmapped.{opcode}"
                    if opcode in ("copy", "dynamic-slice",
                                  "dynamic-update-slice"):
                        key = f"{comp}.copy"
                        copy_ops[f"{op_name[-110:]} | {ev.name[:70]}"] += dur
                    bucket[key] += dur

    s = args.steps
    tot_sync = sum(sync_by_comp.values()) / 1e6 / s
    tot_async = sum(async_by_comp.values()) / 1e6 / s
    print(json.dumps({"wall_ms_per_step": round(wall / s * 1e3, 2),
                      "sync_leaf_ms": round(tot_sync, 1),
                      "async_inflight_ms": round(tot_async, 1)}))
    print("\n== compute (sync leaf) ms/step by component ==")
    for comp, ns in sync_by_comp.most_common(args.top):
        print(f"{ns / 1e6 / s:9.2f}  {comp}")
    print("\n== async/in-flight (bounds, overlap) ms/step by component ==")
    for comp, ns in async_by_comp.most_common(args.top):
        print(f"{ns / 1e6 / s:9.2f}  {comp}")
    if copy_ops:
        print("\n== top sync copies (op_name | instr) ==")
        for name, ns in copy_ops.most_common(args.top):
            print(f"{ns / 1e6 / s:9.3f}  {name}")
    if unmatched:
        top_un = unmatched.most_common(5)
        print("\n== top unmatched instrs ==")
        for name, ns in top_un:
            print(f"{ns / 1e6 / s:9.2f}  {name}")


if __name__ == "__main__":
    main()
