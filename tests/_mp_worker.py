"""Worker for the 2-process distributed CPU test (tests/test_multiprocess.py).

Each process owns 2 virtual CPU devices (4-device global mesh) and a
*different* local batch; the test asserts the semantics the single-process
dryrun cannot: `shard_batch` assembles a global batch of size
2*local (per-host batch convention, reference
`/root/reference/dro_sfm/models/model_wrapper.py:811-849`), gradients are
averaged across hosts by GSPMD, and `all_reduce_metric_sums` passes the
armed all-samples-seen check (`/root/reference/dro_sfm/utils/reduce.py:70-71`).

Usage: _mp_worker.py <process_id> <num_processes> <coordinator_port>
"""
import os
import sys

proc_id = int(sys.argv[1])
nprocs = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nprocs, process_id=proc_id)
assert jax.process_count() == nprocs, jax.process_count()
assert jax.device_count() == 2 * nprocs, jax.device_count()

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dro_sfm_tpu.models.sfm import SfmModelConfig  # noqa: E402
from dro_sfm_tpu.parallel.collectives import all_reduce_metric_sums  # noqa: E402
from dro_sfm_tpu.parallel.mesh import make_mesh, shard_batch  # noqa: E402
from dro_sfm_tpu.training.state import create_train_state, make_optimizer  # noqa: E402
from dro_sfm_tpu.training.step import make_train_step  # noqa: E402
from dro_sfm_tpu.utils.config import load_config  # noqa: E402

b, n, h, w = 2, 2, 32, 64  # per-host batch
rng = np.random.default_rng(100 + proc_id)  # DIFFERENT data per host
K = np.array([[w * 0.8, 0, (w - 1) / 2], [0, w * 0.8, (h - 1) / 2],
              [0, 0, 1.0]], dtype=np.float32)
batch = {
    "rgb": rng.uniform(size=(b, h, w, 3)).astype(np.float32),
    "rgb_context": rng.uniform(size=(b, n, h, w, 3)).astype(np.float32),
    "rgb_original": rng.uniform(size=(b, h, w, 3)).astype(np.float32),
    "rgb_context_original":
        rng.uniform(size=(b, n, h, w, 3)).astype(np.float32),
    "intrinsics": np.broadcast_to(K, (b, 3, 3)).copy(),
    "depth": rng.uniform(1.0, 60.0, size=(b, h, w, 1)).astype(np.float32),
    "pose_context": np.broadcast_to(
        np.eye(4, dtype=np.float32), (b, n, 4, 4)).copy(),
}

mesh = make_mesh()
global_batch = shard_batch(batch, mesh)
# Global batch concatenates per-host batches along data.
assert global_batch["rgb"].shape[0] == b * nprocs, global_batch["rgb"].shape

model_cfg = SfmModelConfig(name="SupModelMF", version="it1-h-out",
                           min_depth=0.2, max_depth=80.0, flip_lr_prob=0.0)
net = model_cfg.build_net()
cfg = load_config()
tx = make_optimizer(cfg.model.optimizer, cfg.model.scheduler,
                    steps_per_epoch=10)

from jax.sharding import NamedSharding, PartitionSpec  # noqa: E402

init_batch = {k: jnp.asarray(batch[k])
              for k in ("rgb", "rgb_context", "intrinsics")}
state = create_train_state(net, jax.random.PRNGKey(0), init_batch, tx)
state = jax.device_put(state, NamedSharding(mesh, PartitionSpec()))

train_step = make_train_step(model_cfg, net)
with mesh:
    state, metrics = train_step(state, global_batch, jax.random.PRNGKey(1))
loss = float(metrics["loss"])
# Replicated loss: every host must fetch the identical global value.
p0 = float(np.asarray(
    jax.tree_util.tree_leaves(state.params)[0]).ravel()[0])

# Armed all-samples-seen check: each host contributes `b` samples.
sums, count = all_reduce_metric_sums(
    np.full(3, (proc_id + 1.0) * b), float(b), expected_total=b * nprocs)
assert count == b * nprocs, count
expect = sum((i + 1.0) * b for i in range(nprocs))
assert np.allclose(sums, expect), (sums, expect)

# Preemption consensus (trainer stop-step agreement): no host flagged ->
# False everywhere; SIGTERM on host 0 only -> True everywhere.
from dro_sfm_tpu.parallel.collectives import any_process_flag  # noqa: E402

assert any_process_flag(False) is False
assert any_process_flag(proc_id == 0) is True

print(f"MPOK {proc_id} loss={loss:.6f} p0={p0:.6f} count={count}",
      flush=True)
