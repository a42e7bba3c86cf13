"""Cross-host metric reduction.

Rebuild of `/root/reference/dro_sfm/utils/reduce.py`: averaging scalar dicts
and gathering per-sample metric tensors across ranks, with the "all samples
seen" accounting. Horovod allreduce maps to `jax.lax.psum` inside jitted
code and `multihost_utils.process_allgather` at the host level; rank-0
gating maps to `jax.process_index() == 0`.
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax
import numpy as np


def reduce_dict(data: Dict[str, float]) -> Dict[str, float]:
    """Mean of a scalar dict over all hosts (`reduce.py:10-29`)."""
    if jax.process_count() == 1:
        return {k: float(v) for k, v in data.items()}
    from jax.experimental import multihost_utils
    keys = sorted(data.keys())
    vec = np.asarray([float(data[k]) for k in keys], dtype=np.float64)
    gathered = multihost_utils.process_allgather(vec)  # [P, K]
    mean = np.asarray(gathered).mean(axis=0)
    return dict(zip(keys, mean.tolist()))


def all_reduce_metric_sums(sums: np.ndarray, count: int,
                           expected_total: int | None = None):
    """Sum per-sample metric accumulators and counts across hosts.

    sums: [K] metric sums over this host's samples; count: samples seen.
    Returns (global_sums [K], global_count). With ``expected_total`` given,
    asserts every dataset sample was seen exactly once — the reference's
    'all samples seen' check (`reduce.py:70-71`).
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        payload = np.concatenate([np.asarray(sums, np.float64),
                                  [float(count)]])
        gathered = np.asarray(multihost_utils.process_allgather(payload))
        total = gathered.sum(axis=0)
        sums, count = total[:-1], int(round(total[-1]))
    if expected_total is not None:
        assert count == expected_total, \
            f"distributed eval saw {count} samples, expected {expected_total}"
    return np.asarray(sums), count


def average_loss_and_metrics(outputs: Sequence[Dict[str, float]],
                             prefix: str = "avg") -> Dict[str, float]:
    """Average a list of per-batch metric dicts (`reduce.py:199-225`)."""
    if not outputs:
        return {}
    keys = outputs[0].keys()
    return {f"{prefix}-{k}": float(np.mean([float(o[k]) for o in outputs
                                            if k in o]))
            for k in keys}


def any_process_flag(local_flag: bool) -> bool:
    """Cross-host OR of a per-process boolean (single-process: identity).

    Used for the preemption consensus in `training/trainer.py`: a SIGTERM
    may land on a subset of hosts, and a lone host leaving the train loop
    would leave the rest hanging in the next gradient psum — every host
    must agree on the stop step. All hosts must call this at the same
    point (it is itself a collective).
    """
    import jax
    if jax.process_count() == 1:
        return bool(local_flag)
    from jax.experimental import multihost_utils
    flags = multihost_utils.process_allgather(
        np.asarray([bool(local_flag)], np.int32))
    return bool(np.asarray(flags).any())
