"""Multi-host launcher: jax.distributed rendezvous over DCN.

The reference is single-process [SURVEY §2.2]; this is the "NCCL/MPI
equivalent" for TPU pod slices [B:L11]: `jax.distributed.initialize` forms
the control plane over DCN, XLA emits ICI/DCN collectives from the shard_map
specs in parallel/halo.py.  Failure model is fail-stop: any host loss aborts
the slice and the launcher's retry restarts from the latest checkpoint
(SURVEY §5 "Failure detection"; jax.distributed has no elasticity).

On a Cloud TPU pod slice the coordinator/process env is auto-detected; for
manual bring-up pass coordinator_address/num_processes/process_id explicitly.
"""
from __future__ import annotations

import os
import time
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> dict:
    """Initialise the multi-host runtime (no-op on a single process).

    Returns topology facts for logging: process index/count, local/global
    device counts.
    """
    explicit = coordinator_address is not None
    auto = (os.environ.get("TPU_WORKER_HOSTNAMES") or
            os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if explicit or (auto and num_processes is None):
        kwargs = {}
        if explicit:
            kwargs = dict(coordinator_address=coordinator_address,
                          num_processes=num_processes,
                          process_id=process_id)
        jax.distributed.initialize(**kwargs)
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def run_with_restart(fn, max_restarts: int = 3, backoff_s: float = 10.0):
    """Fail-stop retry wrapper: rerun `fn` (which must resume from its own
    checkpoints) after a crash, up to max_restarts times."""
    attempt = 0
    while True:
        try:
            return fn()
        except Exception:  # noqa: BLE001 — deliberate fail-stop boundary
            attempt += 1
            if attempt > max_restarts:
                raise
            time.sleep(backoff_s * attempt)
