"""Device mesh + sharding helpers.

The TPU-native replacement for the reference's Horovod/NCCL layer
(`/root/reference/dro_sfm/utils/horovod.py`, `utils/reduce.py`): a single
`jax.sharding.Mesh` with a ``data`` axis (ICI within a host, DCN across
hosts). The train step is jitted with batch inputs sharded over ``data`` and
parameters replicated; gradient averaging is then an implicit XLA
reduce-scatter/all-reduce — no explicit collectives in user code. A ``model``
axis is reserved for view/scene sharding extensions.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(devices: Optional[Sequence] = None,
              data_parallel: Optional[int] = None) -> Mesh:
    """1D/2D mesh over the available devices: (data, model)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    dp = data_parallel or n
    mp = n // dp
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``."""
    return NamedSharding(mesh, PartitionSpec("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Build a globally sharded batch from this host's loader output.

    Single-process: a plain device_put with the batch axis sharded. Multi-
    process: every host holds a *different* local batch, so the global array
    must be assembled with `jax.make_array_from_process_local_data` — the
    global batch concatenates the per-host batches along ``data`` (i.e.
    ``datasets.*.batch_size`` is PER HOST, matching the reference's
    per-worker DataLoader batch under Horovod,
    `/root/reference/dro_sfm/models/model_wrapper.py:811-849`).
    """
    sh = batch_sharding(mesh)
    multiprocess = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and getattr(v, "ndim", 0) >= 1:
            if multiprocess:
                out[k] = jax.make_array_from_process_local_data(
                    sh, np.asarray(v))
            else:
                out[k] = jax.device_put(v, sh)
        else:
            out[k] = v
    return out


def maybe_init_distributed() -> None:
    """Initialize multi-host JAX when launched under a distributed runtime.

    The multi-host replacement for the reference's `mpirun` + `hvd_init`
    (`run.sh:3-4`, `utils/horovod.py:14`): one process per host, coordinated
    through `jax.distributed.initialize`. Controlled by standard env vars
    (JAX_COORDINATOR_ADDRESS / cloud-TPU auto-detection); a no-op when they
    are absent or initialization already happened.
    """
    import os
    # Must not touch the XLA backend before initialize() — even
    # jax.process_count() would finalize a single-process backend.
    if jax.distributed.is_initialized():
        return
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS")
    if coord:
        # Explicit env layout (scripts/launch_multihost.py / generic
        # clusters); jax's own auto-detection (Slurm, TPU pods) covers the
        # rest when these are unset.
        kwargs = {"coordinator_address": coord}
        if os.environ.get("JAX_NUM_PROCESSES"):
            kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        if os.environ.get("JAX_PROCESS_ID"):
            kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
        try:
            jax.distributed.initialize(**kwargs)
        except Exception as e:  # already initialized or single-host
            print(f"jax.distributed.initialize skipped: {e}")


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_rank0() -> bool:
    """Rank-0 gating for logging/checkpointing (`utils/horovod.py:19-23`)."""
    return jax.process_index() == 0
