"""Multi-host launchers: the queue.pl / slurm.pl / ssh.pl role, TPU-native.

The reference runs cluster jobs by rendering its `$cmd` contract over SGE /
Slurm / ssh / PBS (utils/{queue,slurm,ssh,pbs}.pl + conf/slurm.conf, SURVEY
§2.8).  In the rebuild there is no per-GPU process zoo to schedule — training
is ONE program per host (`jax.distributed.initialize` + the same SPMD step,
parallel/distributed.py), so "cluster support" reduces to launching that one
program on every host with the right coordinator/process-count/process-id
environment and run.pl's log + fail-any semantics.  Two transports:

- ``slurm_script(...)`` renders an sbatch file: one task per node, the
  coordinator derived from the Slurm nodelist, PROCESS_ID from
  ``SLURM_PROCID`` (the conf/slurm.conf role, declarative instead of a
  627-line perl renderer).
- ``launch_hosts(...)`` runs the program on an explicit host list over a
  pluggable transport (default ``ssh``), mirroring ssh.pl: per-host logs,
  fail-if-any-fails, COORDINATOR_ADDRESS = first host.

Both feed ``parallel/distributed.initialize``'s env-var contract
(COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID), so the launched command
needs no extra flags.
"""

from __future__ import annotations

import os
import shlex
import subprocess
import time
from typing import Dict, List, Optional, Sequence

from pkr_tpu.utils.jobs import JobError

SLURM_TEMPLATE = """#!/bin/bash
#SBATCH --job-name={name}
#SBATCH --nodes={nodes}
#SBATCH --ntasks-per-node=1
#SBATCH --cpus-per-task={cpus_per_task}
#SBATCH --output={log_dir}/{name}.%n.log
{extra_directives}
mkdir -p {log_dir_q}
# one process per host; jax.distributed derives the device topology
export COORDINATOR_ADDRESS="$(scontrol show hostnames "$SLURM_JOB_NODELIST" \\
    | head -n1):{port}"
export NUM_PROCESSES="$SLURM_NNODES"
# PROCESS_ID must be read inside each srun task: the batch script body runs
# once (where SLURM_PROCID=0), so exporting it here would pin every task to 0
srun --kill-on-bad-exit=1 bash -c {payload}
"""


def slurm_script(command: str, nodes: int, name: str = "pkr_train",
                 log_dir: str = "exp/log", port: int = 8476,
                 cpus_per_task: int = 8,
                 directives: Sequence[str] = ()) -> str:
    """Render an sbatch script launching `command` once per node with the
    jax.distributed env-var contract (slurm.pl + conf/slurm.conf role).

    Note sbatch opens --output before the body runs: `log_dir` must exist on
    the submit host at submission time (write_slurm_script creates it)."""
    extra = "\n".join(f"#SBATCH {d}" for d in directives)
    payload = shlex.quote(
        'export PROCESS_ID="$SLURM_PROCID"; exec ' + command)
    return SLURM_TEMPLATE.format(name=name, nodes=nodes, log_dir=log_dir,
                                 log_dir_q=shlex.quote(log_dir),
                                 port=port, cpus_per_task=cpus_per_task,
                                 payload=payload, extra_directives=extra)


def write_slurm_script(path: str, command: str, nodes: int, **kw) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    os.makedirs(kw.get("log_dir", "exp/log"), exist_ok=True)
    with open(path, "w") as f:
        f.write(slurm_script(command, nodes, **kw))
    os.chmod(path, 0o755)
    return path


def launch_hosts(command: str, hosts: Sequence[str],
                 log_dir: str = "exp/log", name: str = "pkr_train",
                 port: int = 8476, transport: Optional[Sequence[str]] = None,
                 env_extra: Optional[Dict[str, str]] = None,
                 timeout: Optional[float] = None) -> List[int]:
    """ssh.pl role: run `command` on every host concurrently with the
    jax.distributed env, one log per host, raise JobError if any fail.

    transport: argv prefix invoked as `transport + [host, remote_cmd]`;
    defaults to ["ssh", "-o", "BatchMode=yes"].  Tests substitute a local
    shell transport — the launch logic is transport-agnostic.
    """
    transport = list(transport) if transport is not None else [
        "ssh", "-o", "BatchMode=yes"]
    os.makedirs(log_dir, exist_ok=True)
    coordinator = f"{hosts[0]}:{port}"
    procs, logs = [], []
    for pid, host in enumerate(hosts):
        exports = {
            "COORDINATOR_ADDRESS": coordinator,
            "NUM_PROCESSES": str(len(hosts)),
            "PROCESS_ID": str(pid),
            **(env_extra or {}),
        }
        prefix = " ".join(f"export {k}={shlex.quote(v)};"
                          for k, v in exports.items())
        log_path = os.path.join(log_dir, f"{name}.{pid}.log")
        log = open(log_path, "w")
        log.write(f"# started at {time.strftime('%Y-%m-%d %H:%M:%S')} "
                  f"on {host} (process {pid}/{len(hosts)})\n")
        log.flush()
        procs.append(subprocess.Popen(
            transport + [host, f"{prefix} {command}"],
            stdout=log, stderr=subprocess.STDOUT))
        logs.append((log, log_path))
    # one shared deadline (not per-wait: sequential waits would stack to
    # len(hosts)*timeout); stragglers past it are killed and reported as
    # failures alongside nonzero exits, so every log gets its footer and
    # the caller always sees the full per-host failure list
    deadline = None if timeout is None else time.monotonic() + timeout
    failures = []
    for pid, (p, (log, log_path)) in enumerate(zip(procs, logs)):
        try:
            remaining = (None if deadline is None
                         else max(0.0, deadline - time.monotonic()))
            rc = p.wait(timeout=remaining)
        except subprocess.TimeoutExpired:
            p.kill()
            p.wait()
            rc = p.returncode
            log.write(f"# timed out after {timeout}s, killed\n")
        log.write(f"# finished at {time.strftime('%Y-%m-%d %H:%M:%S')} "
                  f"rc={rc}\n")
        log.close()
        if rc != 0:
            failures.append(pid)
    if failures:
        raise JobError(failures, log_dir)
    return [p.returncode for p in procs]
