"""Cluster launchers (queue.pl/slurm.pl/ssh.pl role): script rendering and a
REAL 2-process jax.distributed launch through launch_hosts with a local
transport standing in for ssh."""

import os
import socket
import stat
import sys

import pytest

from pkr_tpu.utils.cluster import launch_hosts, slurm_script, write_slurm_script
from pkr_tpu.utils.jobs import JobError

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_slurm_script_rendering(tmp_path):
    log_dir = str(tmp_path / "log")
    path = write_slurm_script(
        str(tmp_path / "train.sbatch"),
        "python -m pkr_tpu.recipes.run --stage 3 --stop-stage 3 "
        "--data-dir data --exp-dir exp",
        nodes=4, name="vox", log_dir=log_dir, port=9999,
        directives=["--partition=tpu", "--time=24:00:00"])
    s = open(path).read()
    assert "#SBATCH --nodes=4" in s
    assert "#SBATCH --partition=tpu" in s and "#SBATCH --time=24:00:00" in s
    assert 'export NUM_PROCESSES="$SLURM_NNODES"' in s
    # PROCESS_ID must be read inside each srun task (the batch body runs
    # once with SLURM_PROCID=0, so a body-level export would pin every
    # task's id to 0 and deadlock jax.distributed.initialize)
    srun_line = [l for l in s.splitlines() if l.startswith("srun")][0]
    assert 'export PROCESS_ID="$SLURM_PROCID"' in srun_line
    assert "bash -c" in srun_line and "exec python -m" in srun_line
    body = s.split("srun")[0]
    assert 'export PROCESS_ID' not in body
    assert ":9999" in s and f"mkdir -p {log_dir}" in s
    assert os.stat(path).st_mode & stat.S_IXUSR
    # sbatch opens --output before the body runs: the submit host needs
    # log_dir to exist at submission time, so write_slurm_script creates it
    assert os.path.isdir(log_dir)


def _local_transport(tmp_path):
    """A stand-in for ssh: ignores the host argument, runs the command
    locally (the launch logic is transport-agnostic)."""
    sh = tmp_path / "fake_ssh.sh"
    sh.write_text("#!/bin/bash\nshift\nexec bash -c \"$1\"\n")
    sh.chmod(0o755)
    return [str(sh)]


def test_launch_hosts_logs_and_fail_any(tmp_path):
    transport = _local_transport(tmp_path)
    rcs = launch_hosts("echo process $PROCESS_ID of $NUM_PROCESSES",
                       hosts=["hostA", "hostB", "hostC"],
                       log_dir=str(tmp_path / "log"), name="ok",
                       transport=transport)
    assert rcs == [0, 0, 0]
    for pid in range(3):
        text = open(tmp_path / "log" / f"ok.{pid}.log").read()
        assert f"process {pid} of 3" in text
        assert "rc=0" in text
    with pytest.raises(JobError) as e:
        launch_hosts("test $PROCESS_ID -ne 1",  # process 1 fails
                     hosts=["a", "b", "c"], log_dir=str(tmp_path / "log"),
                     name="bad", transport=transport)
    assert e.value.failures == [1]


def test_launch_hosts_timeout_kills_and_reports(tmp_path):
    """A hung host is killed at the shared deadline and reported through the
    normal fail-any JobError (not a raw TimeoutExpired), with its log
    footer written; healthy hosts still succeed."""
    transport = _local_transport(tmp_path)
    import time

    t0 = time.monotonic()
    with pytest.raises(JobError) as e:
        launch_hosts("test $PROCESS_ID -eq 0 && sleep 600; true",
                     hosts=["a", "b"], log_dir=str(tmp_path / "log"),
                     name="hang", transport=transport, timeout=3.0)
    # shared deadline, not per-host: well under 2 * timeout + slack
    assert time.monotonic() - t0 < 30.0
    assert e.value.failures == [0]
    text = open(tmp_path / "log" / "hang.0.log").read()
    assert "timed out" in text and "rc=" in text
    assert "rc=0" in open(tmp_path / "log" / "hang.1.log").read()


def test_launch_hosts_runs_real_distributed_training(tmp_path):
    """End to end: the launcher's env contract drives
    parallel.distributed.initialize with NO flags in the command — a real
    2-process gloo mesh forms and a cross-process reduction agrees."""
    worker = tmp_path / "worker.py"
    worker.write_text(f"""
import sys
sys.path.insert(0, {REPO!r})
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
from pkr_tpu.parallel.distributed import initialize
initialize()  # everything comes from the launcher's env vars
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
mesh = Mesh(np.array(jax.devices()), ("data",))
pid = jax.process_index()
x = jax.make_array_from_callback(
    (jax.process_count(),), NamedSharding(mesh, P("data")),
    lambda _: np.asarray([float(pid + 1)], np.float32))
total = float(jax.jit(jnp.sum)(x))
assert total == 3.0, total
print("launched worker", pid, "sum", total, "OK")
""")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env_extra = {"PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu",
                 "XLA_FLAGS": ""}
    launch_hosts(f"{sys.executable} {worker}",
                 hosts=["localhost", "localhost"],
                 log_dir=str(tmp_path / "log"), name="dist", port=port,
                 transport=_local_transport(tmp_path), env_extra=env_extra,
                 timeout=180)
    for pid in range(2):
        text = open(tmp_path / "log" / f"dist.{pid}.log").read()
        assert f"launched worker {pid} sum 3.0 OK" in text, text


def test_initialize_rejects_incomplete_env_contract(monkeypatch):
    """A stray NUM_PROCESSES without COORDINATOR_ADDRESS must fail fast with
    a message naming the contract, not wander into
    jax.distributed.initialize(num_processes=N) (round-2 advisor finding)."""
    from pkr_tpu.parallel.distributed import initialize

    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.setenv("NUM_PROCESSES", "4")
    with pytest.raises(RuntimeError, match="COORDINATOR_ADDRESS"):
        initialize()
    # nothing configured at all -> single-host no-op
    monkeypatch.delenv("NUM_PROCESSES", raising=False)
    initialize()
