"""Ad-hoc depth-file inspection (reference `debug/debug_depth.py:21+`).

Usage:
    python tools/debug_depth.py depth.png [depth2.npz ...]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from dro_sfm_tpu.utils.depth import load_depth

    for path in sys.argv[1:]:
        depth = np.asarray(load_depth(path)).squeeze()
        valid = depth > 0
        print(f"== {path}")
        print(f"   shape {depth.shape}  dtype {depth.dtype}")
        print(f"   valid {valid.mean() * 100:.1f}%  "
              f"min {depth[valid].min() if valid.any() else 0:.3f}  "
              f"max {depth[valid].max() if valid.any() else 0:.3f}  "
              f"median {np.median(depth[valid]) if valid.any() else 0:.3f}")
        hist, edges = np.histogram(depth[valid], bins=8)
        for h, lo, hi in zip(hist, edges[:-1], edges[1:]):
            bar = "#" * int(40 * h / max(hist.max(), 1))
            print(f"   [{lo:7.2f},{hi:7.2f}) {h:8d} {bar}")


if __name__ == "__main__":
    main()
