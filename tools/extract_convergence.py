"""Extract per-epoch convergence trajectories from training logs.

Parses the stdout log of `scripts/train.py` (step progress lines printed
by `training/trainer.py:301-304`, metric tables by
`utils/logging.py:50-69`) into the trajectory JSON schema used by
docs/convergence_*.json: one record per epoch with the monitored depth
metric, running train loss, and train frames/s. Diverged runs (``nan`` /
``inf`` cells or losses) are preserved as float NaN/inf rather than
silently dropped, so trajectories stay column-stable.

    python tools/extract_convergence.py results/run_a.log:label_a \
        [results/run_b.log:label_b ...] > docs/convergence_x.json
"""
from __future__ import annotations

import json
import re
import sys

ANSI = re.compile(r"\x1b\[[0-9;]*m")
NUM = r"(?:[-+]?[\d.eE+-]+|-?nan|-?inf)"
STEP = re.compile(rf"epoch (\d+) step (\d+)/(\d+) loss {NUM} "
                  rf"\(avg ({NUM})\) ([\d.]+) frames/s")
TITLE = re.compile(r"\|\s*(\S+) epoch (\d+)\s*\|")
ROW = re.compile(rf"\|\s*(depth\S*)\s*((?:\|\s*{NUM}\s*)+)\|")


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
                # split on '|' so nan/inf cells keep column positions
                vals = [float(v.strip()) for v in
                        m.group(2).strip().strip("|").split("|")]
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
