"""Device mesh + sharding helpers.

The TPU-native replacement for the reference's Horovod/NCCL layer
(`/root/reference/dro_sfm/utils/horovod.py`, `utils/reduce.py`): a single
`jax.sharding.Mesh` with a ``data`` axis (ICI within a host, DCN across
hosts) and an optional ``spatial`` axis. The train step is jitted with batch
inputs sharded over ``data`` and parameters replicated; gradient averaging
is then an implicit XLA reduce-scatter/all-reduce — no explicit collectives
in user code.

Spatial partitioning (``arch.spatial_shards`` > 1) additionally shards the
image HEIGHT dimension of every image-like batch input over ``spatial``.
GSPMD then propagates the layout through the network — convolutions become
halo-exchanged spatially partitioned convs, norm/loss reductions psum over
the axis — so activation memory per chip drops ~spatial-fold. This is the
scaling path for inputs too large for one chip's HBM at batch 1 (the regime
where data parallelism alone cannot help); the BA edge work sharded in
`dro_sfm_tpu.ba.dense_ba` uses the ``data`` axis of the same mesh.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(devices: Optional[Sequence] = None,
              data_parallel: Optional[int] = None) -> Mesh:
    """1D/2D mesh over the available devices: (data, spatial).

    ``spatial`` size is ``len(devices) // data_parallel`` (1 for the pure
    data-parallel default). Devices are laid out row-major so the spatial
    groups — which exchange conv halos and psum norm statistics every layer
    — sit on adjacent (highest-bandwidth ICI) devices.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    dp = data_parallel or n
    sp = n // dp
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, axis_names=("data", "spatial"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``."""
    return NamedSharding(mesh, PartitionSpec("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


# Height dimension of each image-like batch input ([B,H,W,C] vs [B,N,H,W,C]);
# everything else (intrinsics, poses, idx) is sharded on batch only.
_SPATIAL_H_DIM = {"rgb": 1, "rgb_original": 1, "depth": 1,
                  "rgb_context": 2, "rgb_context_original": 2}


def _input_sharding(mesh: Mesh, key: str, ndim: int,
                    spatial: bool) -> NamedSharding:
    h = _SPATIAL_H_DIM.get(key)
    if not spatial or h is None or ndim <= h:
        return batch_sharding(mesh)
    spec = [None] * ndim
    spec[0], spec[h] = "data", "spatial"
    return NamedSharding(mesh, PartitionSpec(*spec))


def shard_batch(batch: dict, mesh: Mesh, spatial: bool = False,
                local: bool = False) -> dict:
    """Build a globally sharded batch from this host's loader output.

    Single-process: a plain device_put with the batch axis sharded. Multi-
    process: every host holds a *different* local batch, so the global array
    must be assembled with `jax.make_array_from_process_local_data` — the
    global batch concatenates the per-host batches along ``data`` (i.e.
    ``datasets.*.batch_size`` is PER HOST, matching the reference's
    per-worker DataLoader batch under Horovod,
    `/root/reference/dro_sfm/models/model_wrapper.py:811-849`).

    ``spatial=True`` additionally shards image heights over the mesh's
    ``spatial`` axis (see module docstring); heights must divide by the axis
    size at the feature stride (H/8) for even GSPMD tiling.

    ``local=True`` marks ``mesh`` as spanning only THIS process's devices
    (the host-local eval mesh): the batch is then this process's complete
    array and is placed with a plain device_put even in multi-process runs.
    """
    multiprocess = jax.process_count() > 1 and not local
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and getattr(v, "ndim", 0) >= 1:
            sh = _input_sharding(mesh, k, v.ndim, spatial)
            if multiprocess:
                # The spatial axis lives on each process's local devices
                # (row-major mesh layout), so local data remains exactly
                # this process's addressable slice along ``data``.
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
