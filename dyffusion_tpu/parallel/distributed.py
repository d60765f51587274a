"""Multi-host initialization.

The TPU-native replacement for the reference's implicit NCCL/Gloo setup
inside Lightning DDP (SURVEY.md §5.8): single-controller JAX with
``jax.distributed.initialize()``, then a mesh over all chips. Per-host data
loading feeds ``jax.make_array_from_process_local_data``
(see :func:`dyffusion_tpu.parallel.mesh.shard_batch`).
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. No-ops on a single host.

    On Cloud TPU pods (detected via the TPU worker env the launcher sets:
    TPU_WORKER_HOSTNAMES / TPU_WORKER_COUNT) ``jax.distributed.initialize()``
    is called with no args and auto-detects coordinator/rank from the TPU
    cluster environment; on other setups pass the three args explicitly (or
    via JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID — the
    analogue of the reference's LOCAL_RANK/NODE_RANK env checks,
    ``config_utils.py:305``).
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")
    if coordinator_address is None and num_processes in (None, 1):
        if not _tpu_pod_env():
            return  # single host
        # multi-worker TPU pod with no explicit args: JAX auto-detects
        # coordinator/rank from the TPU cluster environment
    # idempotent: drivers that train then reload-and-test in one process
    # (flagship_run, bench_schedule_quality) call this once per entry point,
    # but jax.distributed.initialize() may only ever run once per process
    if jax.distributed.is_initialized():
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def _tpu_pod_env() -> bool:
    """True when the Cloud TPU launcher environment indicates >1 worker
    (the case where ``jax.distributed.initialize()`` can auto-detect)."""
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hosts.split(",") if h.strip()]) > 1:
        return True
    count = os.environ.get("TPU_WORKER_COUNT")
    return count is not None and count.isdigit() and int(count) > 1


def effective_batch_size(per_host_batch: int, accumulate_grad_batches: int = 1) -> int:
    """Global batch = per-host batch x #hosts x grad accumulation
    (ref ``config_utils.py:153-166``)."""
    return per_host_batch * jax.process_count() * accumulate_grad_batches
