"""Multi-process / multi-host initialization.

TPU-native replacement for the reference's torch.distributed/NCCL setup
(nerf/utils.py:671-717 — scaffolding that was never exercised there).
``initialize()`` wires jax.distributed for multi-host pods; on a single host
it is a no-op. All collective traffic then flows through jax.sharding meshes
(parallel/mesh.py) over ICI/DCN — there are no explicit NCCL calls to port.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    timeout_s: Optional[int] = None,
) -> dict:
    """Initialize jax.distributed when running multi-process.

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID when
    args are omitted (the standard TPU pod launcher contract). Returns a
    summary dict {process_id, num_processes, local_devices, global_devices}.

    ``timeout_s`` (or JAX_INIT_TIMEOUT): bound the rendezvous — a worker
    whose pod peer never shows up terminates with a FATAL
    DEADLINE_EXCEEDED exit after this many seconds instead of hanging
    forever (jax's coordination client aborts rather than raising; the
    launcher acts on the nonzero exit — tests/test_distributed_multiproc
    ::test_missing_peer_is_detected_not_hung). The reference has no
    failure detection at all (its DDP scaffolding was never exercised,
    nerf/utils.py:671-717).
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1") or 1)
    process_id = (
        process_id if process_id is not None else int(os.environ.get("JAX_PROCESS_ID", "0") or 0)
    )
    if timeout_s is None:
        env_t = os.environ.get("JAX_INIT_TIMEOUT", "")
        timeout_s = int(env_t) if env_t else None
    if num_processes > 1:
        kw = {}
        if timeout_s is not None:
            kw["initialization_timeout"] = timeout_s
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kw,
        )
    return {
        "process_id": process_id,
        "num_processes": num_processes,
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def is_main_process() -> bool:
    return jax.process_index() == 0
