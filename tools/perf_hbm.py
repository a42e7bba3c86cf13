"""Per-component HBM-traffic budget from the POST-OPTIMIZATION TPU HLO.

The round-2 question "the step is bandwidth-bound — so where do the bytes
go?" needs per-component attribution, which CPU-side cost analysis cannot
give (different fusion decisions). This tool compiles the flagship train
step on the attached TPU, walks the optimized entry computation, and
charges every top-level op (fusions, convolutions, Pallas custom-calls,
copies — post-fusion these are the units that actually read/write HBM)
with ``bytes(operands) + bytes(output)``, grouped by the jax scope in the
op's ``metadata op_name``.

The model is memory-space-aware: TPU HLO layouts carry an ``S(n)``
memory-space tag (1 = VMEM, 2 = SMEM scalars, 6 = host; untagged =
default = HBM), and the compiler pins a large part of the refinement
working set in VMEM — charging those ops as HBM traffic would overstate
the budget ~2x (measured: 85 GB naive vs the space-aware total). Only
HBM-resident bytes are charged, on both the operand and the output side.
It still double-counts operands read by several consumers, so totals run
a bit hot; relative shares are what matter.

Usage:
    python tools/perf_hbm.py [--batch 8] [--image-shape 192 640] [--top 25]
    python tools/perf_hbm.py --dump-hlo /tmp/step.hlo   # raw text too
    python tools/perf_hbm.py --from-hlo /tmp/step.hlo   # re-analyze a dump
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DTYPE_BYTES = {"f64": 8, "f32": 4, "f16": 2, "bf16": 2, "s64": 8, "u64": 8,
               "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
               "pred": 1, "f8e4m3fn": 1, "f8e5m2": 1}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\](\{[^{}]*\})?")


def shape_bytes(type_str: str) -> int:
    """Total bytes of an HLO type string, incl. tuple types."""
    return _bytes(type_str)[0]


def _bytes(type_str: str):
    """(total_bytes, hbm_bytes) of an HLO type string, incl. tuples.

    An array element counts toward ``hbm_bytes`` only when its layout has
    no ``S(n)`` memory-space tag (default space = HBM). VMEM/SMEM/host
    residents are free from the HBM roofline's point of view.
    """
    total = hbm = 0
    for dtype, dims, layout in _SHAPE_RE.findall(type_str):
        if dtype not in DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        b = n * DTYPE_BYTES[dtype]
        total += b
        if "S(" not in layout:
            hbm += b
    return total, hbm


# One HLO instruction: "%name = <type> opcode(operands...), ..."
_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*((?:\([^)]*\))|(?:[\w\[\]{},:()#\s*]+?))\s+"
    r"([\w\-]+)\(")
_OPNAME_RE = re.compile(r'op_name="([^"]+)"')


def component_of(op_name: str, opcode: str) -> str:
    """Map a jax metadata op_name onto a human bucket."""
    name = op_name or ""
    bwd = ("transpose(" in name) or "/vjp" in name
    for pat, label in (
            (r"fnet/", "encoder_fnet"),
            (r"cnet_depth/", "encoder_cnet_depth"),
            (r"cnet_pose/", "encoder_cnet_pose"),
            (r"update_block_depth/", "refine_depth"),
            (r"update_block_pose/", "refine_pose"),
            (r"mask_head|upsample", "upsample_mask"),
            (r"depth_head|pose_head|upmask", "init_heads"),
            (r"warp_cost|tent_warp|warp", "warp_cost"),
            (r"supervised|photometric|loss", "loss"),
            (r"adam|opt_state|scale_by", "optimizer"),
    ):
        if re.search(pat, name):
            return ("bwd:" if bwd else "fwd:") + label
    if opcode == "custom-call":
        return ("bwd:" if bwd else "fwd:") + "custom_call"
    return ("bwd:" if bwd else "fwd:") + "other"


def analyze(hlo_text: str):
    """Per-op HBM bytes for the ENTRY computation."""
    # Entry computation: from "ENTRY %name" to its closing brace.
    m = re.search(r"^ENTRY [^\n]*\{", hlo_text, re.M)
    if m is None:
        raise ValueError("no ENTRY computation found")
    body = hlo_text[m.end():]
    body = body[:body.index("\n}")]

    hbm_of: dict = {}   # instr name -> HBM-resident bytes of its output
    rows = []
    for line in body.splitlines():
        mi = _INSTR_RE.match(line)
        if not mi:
            continue
        name, type_str, opcode = mi.groups()
        obytes, ohbm = _bytes(type_str)
        hbm_of[name] = ohbm
        if opcode in ("parameter", "constant", "get-tuple-element",
                      "tuple", "bitcast", "slice-done", "copy-done",
                      "after-all"):
            # Aliases, not traffic: their type string (incl. space tag)
            # says where consumers will read the value from. *-done halves
            # of async pairs: traffic is charged on -start.
            continue
        if opcode in ("slice-start", "copy-start", "slice", "copy",
                      "dynamic-slice", "dynamic-update-slice"):
            # Data movement touches exactly the moved bytes on each side
            # that is HBM-resident (a slice does NOT read its whole
            # operand; prefetches into S(1) VMEM cost one HBM read and a
            # free VMEM write). Async start tuple types include the
            # aliased operand shape; the payload is the second tuple
            # element ~= the largest non-scalar after dropping it.
            if type_str.lstrip().startswith("("):
                elems = [_bytes("%s[%s]%s" % g) for g in
                         _SHAPE_RE.findall(type_str)]
                cand = [e for e in elems[1:] if e[0] > 8]
                moved, dest_hbm = max(cand) if cand else (obytes, ohbm)
            else:
                moved, dest_hbm = obytes, ohbm
            operands = re.findall(r"%([\w.\-]+)", line[mi.end():])
            src_hbm = any(hbm_of.get(o, 0) > 0 for o in operands)
            touched = moved * int(src_hbm) + moved * int(dest_hbm > 0)
            hbm_of[name] = moved if dest_hbm else 0
            if touched:
                op_name = (_OPNAME_RE.search(line) or [None, ""])[1]
                rows.append({"name": name, "opcode": opcode,
                             "bytes": touched,
                             "component": "data_movement",
                             "op_name": op_name})
            continue
        # Operand list: the top-level %refs in the call parentheses.
        rest = line[mi.end():]
        depth = 1
        args = ""
        for ch in rest:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            args += ch
        operands = re.findall(r"%([\w.\-]+)", args)
        ibytes = sum(hbm_of.get(o, 0) for o in operands)
        if ohbm + ibytes == 0:
            continue  # fully VMEM/SMEM-resident op: no HBM traffic
        op_name = (_OPNAME_RE.search(line) or [None, ""])[1]
        rows.append({"name": name, "opcode": opcode,
                     "bytes": ohbm + ibytes,
                     "component": component_of(op_name, opcode),
                     "op_name": op_name})
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--views", type=int, default=2)
    ap.add_argument("--image-shape", type=int, nargs=2, default=(192, 640))
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--dump-hlo", default=None)
    ap.add_argument("--from-hlo", default=None,
                    help="re-analyze an existing HLO dump (no compile)")
    ap.add_argument("--mixed-precision", action="store_true", default=True)
    ap.add_argument("--fp32", dest="mixed_precision", action="store_false")
    ap.add_argument("--warp-impl", default="pallas")
    ap.add_argument("--scan-unroll", default="full")
    args = ap.parse_args()

    if args.from_hlo:
        with open(args.from_hlo) as f:
            report(analyze(f.read()), args)
        return

    from dro_sfm_tpu.utils.misc import apply_platform_env
    apply_platform_env()
    import jax

    from tools.perf_ablate import make_batch
    from dro_sfm_tpu.models.sfm import SfmModelConfig
    from dro_sfm_tpu.training.state import create_train_state, make_optimizer
    from dro_sfm_tpu.training.step import make_train_step
    from dro_sfm_tpu.utils.config import load_config

    h, w = args.image_shape
    batch = make_batch(args.batch, args.views, h, w)
    model_cfg = SfmModelConfig(
        name="SupModelMF", version="it12-h-out", min_depth=0.2,
        max_depth=80.0, flip_lr_prob=0.0,
        mixed_precision=args.mixed_precision, remat=False,
        scan_unroll=args.scan_unroll, warp_impl=args.warp_impl)
    net = model_cfg.build_net()
    cfg = load_config()
    tx = make_optimizer(cfg.model.optimizer, cfg.model.scheduler, 1000)
    state = create_train_state(
        net, jax.random.PRNGKey(0),
        {k: batch[k] for k in ("rgb", "rgb_context", "intrinsics")}, tx)
    step = make_train_step(model_cfg, net)

    compiled = step.lower(state, batch, jax.random.PRNGKey(1)).compile()
    hlo = compiled.runtime_executable().hlo_modules()[0].to_string()
    if args.dump_hlo:
        with open(args.dump_hlo, "w") as f:
            f.write(hlo)

    report(analyze(hlo), args)


def report(rows, args):
    h, w = args.image_shape
    total = sum(r["bytes"] for r in rows)
    by_comp = defaultdict(int)
    for r in rows:
        by_comp[r["component"]] += r["bytes"]

    print(f"# modeled HBM traffic: {total / 1e9:.2f} GB/step "
          f"(b{args.batch} {h}x{w}, {len(rows)} HBM-touching ops)")
    print(f"{'component':<28}{'GB':>8}{'share':>8}")
    for comp, byt in sorted(by_comp.items(), key=lambda kv: -kv[1]):
        print(f"{comp:<28}{byt / 1e9:>8.2f}{byt / total:>8.1%}")
    print("\n# heaviest single ops")
    for r in sorted(rows, key=lambda r: -r["bytes"])[:args.top]:
        nm = (r["op_name"] or "")[-90:]
        print(f"{r['bytes'] / 1e9:>7.3f} GB  {r['opcode']:<14} "
              f"{r['component']:<22} {nm}")
    print(json.dumps({"metric": "hbm_budget_gb", "total_gb":
                      round(total / 1e9, 2),
                      "by_component_gb": {k: round(v / 1e9, 3)
                                          for k, v in by_comp.items()}}))


if __name__ == "__main__":
    main()
