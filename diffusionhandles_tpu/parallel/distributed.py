"""Multi-process / multi-host runtime (JAX multi-controller).

The reference "distributes" by placing single-GPU HTTP services on 3 GPUs
via a shell script (reference: webapp/start_webapps_in_tmux.sh:21-43). The
TPU-native equivalent (SURVEY.md section 5.8(b)) uses JAX's standard
multi-controller runtime: each service process calls
`jax.distributed.initialize` with a shared coordinator, so cross-host
communication rides the JAX runtime (DCN/ICI) rather than hand-rolled
sockets, while the HTTP endpoints keep per-service API parity.

Env-variable contract (set per process by the launcher):
  DIFFHANDLES_COORDINATOR   host:port of process 0 (e.g. localhost:9911)
  DIFFHANDLES_NUM_PROCESSES total process count
  DIFFHANDLES_PROCESS_ID    this process's id [0, num_processes)
"""

from __future__ import annotations

import os
from typing import Optional, Sequence


def distributed_env() -> Optional[dict]:
    """Read the launcher's env contract; None when not set."""
    coord = os.environ.get("DIFFHANDLES_COORDINATOR")
    if not coord:
        return None
    return dict(
        coordinator_address=coord,
        num_processes=int(os.environ.get("DIFFHANDLES_NUM_PROCESSES", "1")),
        process_id=int(os.environ.get("DIFFHANDLES_PROCESS_ID", "0")),
    )


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids: Optional[Sequence[int]] = None
                     ) -> dict:
    """Join the JAX multi-controller runtime.

    Call BEFORE any other JAX API (device initialization is one-shot).
    Arguments default to the env contract above. Returns a summary dict
    {process_id, num_processes, local_devices, global_devices}.
    """
    env = distributed_env() or {}
    coordinator_address = coordinator_address or env.get(
        "coordinator_address")
    num_processes = num_processes or env.get("num_processes")
    process_id = process_id if process_id is not None else env.get(
        "process_id")
    if coordinator_address is None:
        raise ValueError("No coordinator address (arg or "
                         "DIFFHANDLES_COORDINATOR)")

    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    return dict(process_id=jax.process_index(),
                num_processes=jax.process_count(),
                local_devices=len(jax.local_devices()),
                global_devices=len(jax.devices()))


def maybe_init_from_env() -> Optional[dict]:
    """Initialize the multi-controller runtime iff the launcher set the env
    contract; no-op (returns None) otherwise. Service entry points call this
    first so the same code runs single-process and multi-host."""
    if distributed_env() is None:
        return None
    return init_distributed()
