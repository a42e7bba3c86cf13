"""Dump the optimized HLO of the train step for traffic analysis.

Forces the CPU backend in-process (safe to run while a TPU job is live;
fusion decisions differ from TPU but the stored-activation structure and
dtypes are the same). Writes the optimized HLO text and prints a census of
the largest buffer shapes.

Usage: python tools/dump_hlo.py [--mixed-precision] [--remat] [--batch 4]
       [--out /tmp/hlo.txt]
"""
import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--mixed-precision", action="store_true")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--out", default="/tmp/hlo.txt")
    args = ap.parse_args()

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
        remat=args.remat)
    net = model_cfg.build_net()
    cfg = load_config()
    tx = make_optimizer(cfg.model.optimizer, cfg.model.scheduler, 1000)
    state = create_train_state(
        net, jax.random.PRNGKey(0),
        {k: batch[k] for k in ("rgb", "rgb_context", "intrinsics")}, tx)
    train_step = make_train_step(model_cfg, net)
    compiled = train_step.lower(state, batch, jax.random.PRNGKey(1)).compile()
    hlo = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(hlo)
    print(f"wrote {len(hlo)} bytes to {args.out}")

    # census: output-buffer bytes by (op kind, dtype), and top shapes
    dt_bytes = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
                "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8}
    op_re = re.compile(
        r"^\s*(?:ROOT\s+)?%?[\w.-]+ = (\w+)\[([\d,]*)\][^=]*? (\w+)\(",
        re.M)
    agg = collections.Counter()
    shape_agg = collections.Counter()
    for m in op_re.finditer(hlo):
        dt, dims, kind = m.groups()
        if dt not in dt_bytes:
            continue
        nelem = 1
        for d in filter(None, dims.split(",")):
            nelem *= int(d)
        nbytes = nelem * dt_bytes[dt]
        agg[(kind, dt)] += nbytes
        shape_agg[f"{dt}[{dims}] {kind}"] += nbytes
    print("\n== output bytes by (op, dtype), top 25 ==")
    for (kind, dt), nb in agg.most_common(25):
        print(f"{nb / 2**20:10.1f} MiB  {kind:30s} {dt}")
    print("\n== top 25 shape+op ==")
    for key, nb in shape_agg.most_common(25):
        print(f"{nb / 2**20:10.1f} MiB  {key}")


if __name__ == "__main__":
    main()
