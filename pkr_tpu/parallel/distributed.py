"""Multi-host initialization and host-sharding helpers.

The reference expressed multi-node training as flag plumbing around
torch.distributed TCP rendezvous (--world-size/--rank/--dist-url,
train_resnet.py:73-78; node IP lists commented at run.sh:215-228) and never
tested it (SURVEY §4.5).  The JAX equivalent is one call per host before any
device use; afterwards the same SPMD program runs, with
`jax.process_index()` feeding the host-sharded samplers
(pkr_tpu.data.sampler epoch_indices / EvalLoader).
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var fallbacks
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID); no-op when
    single-process and nothing is configured."""
    import jax

    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("NUM_PROCESSES"):
        num_processes = int(os.environ["NUM_PROCESSES"])
    if coordinator_address is None and num_processes is None:
        return  # single host: nothing configured via args OR env
    if coordinator_address is None:
        # a stray NUM_PROCESSES without the rest of the contract would send a
        # single-host run into jax.distributed.initialize(num_processes=N),
        # which errors or hangs outside a managed pod — fail fast instead
        raise RuntimeError(
            f"NUM_PROCESSES={num_processes} is set but COORDINATOR_ADDRESS is "
            "not — incomplete jax.distributed env contract (utils.cluster "
            "launch_hosts/slurm_script export COORDINATOR_ADDRESS, "
            "NUM_PROCESSES and PROCESS_ID together); unset NUM_PROCESSES for "
            "a single-host run")
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None or os.environ.get("NUM_PROCESSES"):
        kwargs["num_processes"] = int(num_processes or os.environ["NUM_PROCESSES"])
    if process_id is not None or os.environ.get("PROCESS_ID"):
        kwargs["process_id"] = int(process_id if process_id is not None
                                   else os.environ["PROCESS_ID"])
    jax.distributed.initialize(**kwargs)


def host_info():
    """(process_index, process_count, local_device_count)."""
    import jax

    return jax.process_index(), jax.process_count(), jax.local_device_count()
