"""Terminal logging: colors, sliding-window averages, metric tables.

Rebuild of `/root/reference/dro_sfm/utils/logging.py` (pcolor, AvgMeter,
prefixes) and the metric table printer
(`/root/reference/dro_sfm/models/model_wrapper.py:401-453`).
"""
from __future__ import annotations

import os
from typing import Dict, Sequence

_COLORS = {"red": 31, "green": 32, "yellow": 33, "blue": 34,
           "magenta": 35, "cyan": 36, "white": 37}


def pcolor(text: str, color: str = "white", bold: bool = False) -> str:
    """ANSI-colored text (`utils/logging.py:9-29`)."""
    code = _COLORS.get(color, 37)
    attr = "1;" if bold else ""
    return f"\033[{attr}{code}m{text}\033[0m"


class AvgMeter:
    """Sliding-window scalar average (`utils/logging.py:136-169`)."""

    def __init__(self, n_max: int = 100):
        self.n_max = n_max
        self.values: list[float] = []

    def __call__(self, value: float) -> float:
        self.values.append(float(value))
        if len(self.values) > self.n_max:
            self.values.pop(0)
        return self.get()

    def get(self) -> float:
        return sum(self.values) / max(len(self.values), 1)

    def reset(self) -> None:
        self.values.clear()


def prepare_dataset_prefix(path: str, split: str) -> str:
    """Metric-name prefix from dataset path+split
    (`utils/logging.py:32-60`)."""
    prefix = os.path.splitext(os.path.basename(split))[0]
    return f"{os.path.basename(path)}-{prefix}"


def print_metrics_table(metrics: Dict[str, Sequence[float]],
                        metric_keys: Sequence[str],
                        title: str = "") -> None:
    """Print the reference-style metrics table
    (`model_wrapper.py:401-453`)."""
    width = 16 + 11 * len(metric_keys)
    hor = "|" + "*" * width + "|"
    print("\n" + hor)
    if title:
        print("| " + pcolor(f"{title:<{width - 2}}", "magenta", bold=True) + " |")
        print(hor)
    header = "| {:^14} ".format("METRIC") + "".join(
        "| {:^8} ".format(k[:8]) for k in metric_keys) + "|"
    print(header)
    print(hor)
    for name, vals in metrics.items():
        row = "| {:<14} ".format(name[:14]) + "".join(
            "| {:^8.3f} ".format(float(v)) for v in vals) + "|"
        print(pcolor(row, "cyan"))
    print(hor + "\n")
