"""Worker for the 2-process end-to-end Trainer test.

Drives the FULL `Trainer.fit()` path — config, synthetic datasets,
host-sharded loaders, jitted train/eval steps over the global mesh,
cross-host metric reduction with the armed all-samples-seen check, and
rank-0-gated checkpointing — under a real 2-process `jax.distributed`
run. This is the integration layer the low-level `_mp_worker.py` test
cannot cover (both trainer-mesh bugs found in review lived here).

Usage: _mp_trainer_worker.py <process_id> <num_processes> <port> <tmpdir> \
           [spatial_shards]
"""
import os
import sys

proc_id = int(sys.argv[1])
nprocs = int(sys.argv[2])
port = sys.argv[3]
tmpdir = sys.argv[4]
spatial = int(sys.argv[5]) if len(sys.argv) > 5 else 1

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nprocs, process_id=proc_id)
assert jax.process_count() == nprocs, jax.process_count()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from dro_sfm_tpu.training.trainer import Trainer  # noqa: E402
from dro_sfm_tpu.utils.config import load_config  # noqa: E402

cfg = load_config(overrides={
    "name": "mp_trainer",
    "arch": {"max_epochs": 1, "seed": 42, "spatial_shards": spatial},
    "checkpoint": {"filepath": os.path.join(tmpdir, "ckpt"),
                   "save_top_k": 1},
    "model": {
        "name": "SupModelMF",
        "depth_net": {"name": "DepthPoseNet", "version": "it1-h-out"},
        "params": {"crop": "", "min_depth": 0.2, "max_depth": 20.0},
        "loss": {"flip_lr_prob": 0.0},
    },
    "datasets": {
        "augmentation": {"image_shape": (32, 64)},
        # batch_size is PER HOST: global train batch = 2 * nprocs over a
        # (2*nprocs)-device data axis.
        "train": {"batch_size": 2, "num_workers": 0,
                  "dataset": ["Synthetic"], "path": ["0"], "split": ["4"],
                  "repeat": [1], "back_context": 1, "forward_context": 1},
        "validation": {"batch_size": 2, "num_workers": 0,
                       "dataset": ["Synthetic"], "path": ["7"],
                       "split": ["4"], "back_context": 1,
                       "forward_context": 1},
        "test": {"dataset": [], "path": [], "split": []},
    },
})

trainer = Trainer(cfg)
assert trainer.mesh.shape["data"] == 2 * nprocs // spatial, trainer.mesh.shape
assert trainer.mesh.shape["spatial"] == spatial, trainer.mesh.shape
metrics = trainer.fit()

loss = metrics["avg_train-loss"]
abs_rel = metrics["abs_rel-0"]
assert np.isfinite(loss) and np.isfinite(abs_rel), metrics

# Rank-0-gated checkpointing wrote the epoch checkpoint. Only rank 0
# checks: the other rank reaches this line while rank 0 may still be
# serializing (no barrier after fit).
if proc_id == 0:
    assert any(f.endswith(".ckpt") for f in
               os.listdir(os.path.join(tmpdir, "ckpt")))

with open(os.path.join(tmpdir, f"result_{proc_id}.txt"), "w") as f:
    f.write(f"{loss:.8f} {abs_rel:.8f}")
print(f"TRAINEROK {proc_id}", flush=True)
