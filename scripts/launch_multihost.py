"""Multi-host launcher: the TPU-native replacement for the reference's
``run.sh`` (mpirun + Horovod, `/root/reference/run.sh:3-4`).

JAX multi-host needs one Python process per host, coordinated through
`jax.distributed.initialize` (consumed by
`dro_sfm_tpu.parallel.mesh.maybe_init_distributed`). Three launch modes:

1. **TPU pod** — no launcher needed: run the same command on every worker
   (`gcloud compute tpus tpu-vm ssh $TPU --worker=all --command="python
   scripts/train.py cfg.yaml"`); jax auto-detects the pod topology.
2. **Generic cluster** — export ``JAX_COORDINATOR_ADDRESS=host0:1234``,
   ``JAX_NUM_PROCESSES`` and ``JAX_PROCESS_ID`` per host, then run the
   training command on every host.
3. **Local smoke test** (this script) — spawn N coordinated processes on
   this machine with ``--devices-per-proc`` virtual CPU devices each, to
   exercise the real multi-process code paths (global batch assembly,
   cross-host metric reduction) without a pod.

Usage:
    python scripts/launch_multihost.py --nprocs 2 --devices-per-proc 2 \
        -- scripts/train.py configs/overfit_synthetic.yaml
"""
from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def main():
    p = argparse.ArgumentParser(
        description="spawn N locally-coordinated jax.distributed processes")
    p.add_argument("--nprocs", type=int, default=2)
    p.add_argument("--devices-per-proc", type=int, default=2,
                   help="virtual CPU devices per process")
    p.add_argument("--port", type=int, default=0,
                   help="coordinator port (0 = pick a free one)")
    p.add_argument("command", nargs=argparse.REMAINDER,
                   help="-- script.py args...")
    args = p.parse_args()

    cmd = [c for c in args.command if c != "--"]
    if not cmd:
        p.error("no command given (usage: ... -- scripts/train.py cfg.yaml)")
    port = args.port or free_port()

    procs = []
    for pid in range(args.nprocs):
        env = {
            **os.environ,
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": (os.environ.get("XLA_FLAGS", "") +
                          f" --xla_force_host_platform_device_count="
                          f"{args.devices_per_proc}"),
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": str(args.nprocs),
            "JAX_PROCESS_ID": str(pid),
        }
        procs.append(subprocess.Popen([sys.executable, "-u"] + cmd, env=env))
        print(f"launched process {pid} (pid {procs[-1].pid}) "
              f"coordinator 127.0.0.1:{port}")

    rc = 0
    for pr in procs:
        rc = pr.wait() or rc
    sys.exit(rc)


if __name__ == "__main__":
    main()
