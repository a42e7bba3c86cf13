"""Tracing and per-step timing.

The reference's only profiling hooks are `HOROVOD_TIMELINE` and wall-clock
timers (SURVEY.md §5). TPU-native replacements:

* `trace(logdir)` — context manager around `jax.profiler` producing a
  TensorBoard-loadable device trace;
* `StepTimer` — wall-clock per-step statistics with a forced host fetch,
  because on remote-attached backends `block_until_ready` does not reliably
  synchronize (see bench.py).
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str = "./profiles"):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def force_sync(tree) -> None:
    """Fetch one scalar of the pytree to guarantee device completion."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    _ = np.asarray(leaf).ravel()[0]


class StepTimer:
    """Wall-clock step timing with robust synchronization."""

    def __init__(self):
        self.samples: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, sync_tree=None) -> float:
        if sync_tree is not None:
            force_sync(sync_tree)
        dt = time.perf_counter() - self._t0
        self.samples.append(dt)
        return dt

    def stats(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        arr = np.asarray(self.samples)
        return {
            "steps": float(arr.size),
            "mean_ms": float(arr.mean() * 1000),
            "p50_ms": float(np.percentile(arr, 50) * 1000),
            "p90_ms": float(np.percentile(arr, 90) * 1000),
            "min_ms": float(arr.min() * 1000),
        }
