"""Extract per-epoch convergence trajectories from training logs.

Parses the stdout log of `scripts/train.py` (step progress lines +
validation metric tables, `utils/logging.py:50-70`) into the trajectory
JSON schema used by docs/convergence_*.json: one record per epoch with
the monitored depth metric, running train loss, and train frames/s.

    python tools/extract_convergence.py results/run_a.log:label_a \
        [results/run_b.log:label_b ...] > docs/convergence_x.json
"""
from __future__ import annotations

import json
import re
import sys

ANSI = re.compile(r"\x1b\[[0-9;]*m")
STEP = re.compile(r"epoch (\d+) step (\d+)/(\d+) loss [\d.eE+-]+ "
                  r"\(avg ([\d.eE+-]+)\) ([\d.]+) frames/s")
TITLE = re.compile(r"\|\s*(\S+) epoch (\d+)\s*\|")
ROW = re.compile(r"\|\s*(depth\S*)\s*((?:\|\s*[\d.eE+-]+\s*)+)\|")


def parse_log(path: str, metric_row: str = "depth_pp_gt",
              metric_col: int = 0):
    """Return [{epoch, <metric>, avg_train_loss, frames_per_sec}, ...]."""
    epochs = {}
    cur_title_epoch = None
    with open(path) as f:
        for raw in f:
            line = ANSI.sub("", raw.rstrip("\n"))
            m = STEP.search(line)
            if m:
                ep = int(m.group(1))
                rec = epochs.setdefault(ep, {"epoch": ep})
                rec["avg_train_loss"] = float(m.group(4))
                rec["frames_per_sec"] = float(m.group(5))
                continue
            m = TITLE.search(line)
            if m:
                cur_title_epoch = int(m.group(2))
                continue
            m = ROW.search(line)
            if m and cur_title_epoch is not None:
                if m.group(1) != metric_row:
                    continue
                vals = [float(v) for v in
                        re.findall(r"[\d.eE+-]+", m.group(2))]
                rec = epochs.setdefault(cur_title_epoch,
                                        {"epoch": cur_title_epoch})
                # first table of the epoch wins (the monitored
                # validation split comes first; test tables repeat the
                # title with the final epoch number).
                rec.setdefault("abs_rel" + metric_row[len("depth"):],
                               round(vals[metric_col], 4))
    return [epochs[k] for k in sorted(epochs)]


def main():
    out = {}
    for arg in sys.argv[1:]:
        path, _, label = arg.partition(":")
        out[label or path] = parse_log(path)
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
