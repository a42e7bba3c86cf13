"""True 2-process distributed training test on CPU.

Launches two `jax.distributed`-coordinated subprocesses (2 virtual CPU
devices each → 4-device global mesh) that run one sharded train step on
*different* local batches and a metric all-reduce with the armed
all-samples-seen check. This exercises the multi-host code paths the
single-process 8-device dryrun cannot: `jax.make_array_from_process_local_data`
batch assembly, cross-host gradient averaging, and cross-host metric sums
(reference semantics: `/root/reference/dro_sfm/utils/reduce.py:40-75`).
"""
import os
import re
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_train_step_and_metric_reduce():
    nprocs = 2
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(nprocs), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for i in range(nprocs)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"MPOK {i}" in out, out

    # Every host must observe identical replicated loss/params.
    vals = [re.search(r"loss=([\d.eE+-]+) p0=([\d.eE+-]+)", o).groups()
            for o in outs]
    assert vals[0] == vals[1], vals


@pytest.mark.slow
@pytest.mark.parametrize("spatial", [1, 2])
def test_two_process_trainer_fit(tmp_path, spatial):
    """Full `Trainer.fit()` (config -> loaders -> sharded steps -> metric
    reduce -> checkpoint) under a real 2-process `jax.distributed` run;
    the cross-host-reduced validation metrics must agree bit-for-bit.
    spatial=2 additionally exercises multi-host spatial partitioning,
    including validation's host-local eval-mesh param placement."""
    nprocs = 2
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_mp_trainer_worker.py")
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(nprocs), str(port),
             str(tmp_path), str(spatial)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for i in range(nprocs)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"TRAINEROK {i}" in out, out
    results = [(tmp_path / f"result_{i}.txt").read_text()
               for i in range(nprocs)]
    assert results[0] == results[1], results


def test_launch_multihost_wires_maybe_init_distributed(tmp_path):
    """The launcher's env layout must be consumed by
    `maybe_init_distributed` (scripts/launch_multihost.py)."""
    probe = tmp_path / "probe.py"
    probe.write_text(
        "import sys, os\n"
        f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from dro_sfm_tpu.parallel.mesh import maybe_init_distributed\n"
        "maybe_init_distributed()\n"
        "assert jax.process_count() == 2, jax.process_count()\n"
        # Per-rank marker files: both ranks share the launcher's stdout
        # pipe, and concurrent writes can interleave mid-line.
        f"open(os.path.join({str(tmp_path)!r}, "
        "f'launchok_{jax.process_index()}'), 'w')"
        ".write(str(jax.device_count()))\n")
    res = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.dirname(
             os.path.abspath(__file__))), "scripts", "launch_multihost.py"),
         "--nprocs", "2", "--devices-per-proc", "1", "--", str(probe)],
        capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stdout + res.stderr
    for rank in (0, 1):
        marker = tmp_path / f"launchok_{rank}"
        assert marker.exists(), res.stdout + res.stderr
        assert marker.read_text() == "2", marker.read_text()
