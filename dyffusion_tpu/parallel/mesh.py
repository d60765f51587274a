"""Device mesh + sharding for data-parallel training.

The reference's only parallelism is Lightning DDP (SURVEY.md §2.7:
``configs/trainer/ddp.yaml`` — replicated params, sharded batch, NCCL
all-reduce). The TPU-native equivalent: a 1-D ``Mesh(('data',))`` over all
chips, params/opt-state replicated, batch sharded on axis 0, and XLA inserts
the gradient all-reduce (psum over ICI) automatically when the jitted train
step consumes sharded batches with replicated params — no hand-written
collectives needed (the single-controller recipe of the scaling book).

A 'model' axis is reserved in :func:`make_mesh` for future tensor/spatial
sharding (SURVEY.md §5.7 extension point); it is size 1 for all reference
workloads.

Multi-host: call ``jax.distributed.initialize()`` before :func:`make_mesh`
(ref §5.8); per-host data loading feeds
``jax.make_array_from_process_local_data`` in :func:`shard_batch`.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1, devices=None) -> Mesh:
    """1-D (or 2-D with a model axis) mesh over available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n_data = n_data or (len(devices) // n_model)
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs more than {len(devices)} devices"
    )
    grid = devices[: n_data * n_model].reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch sharded over the data axis. Under multi-host this is
    where per-process shards combine into one global array."""
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        if jax.process_count() > 1:
            out[k] = jax.make_array_from_process_local_data(sh, v)
        else:
            out[k] = jax.device_put(v, sh)
    return out


def shard_train_state(state, mesh: Mesh):
    """Replicate the whole train state over the mesh (params, EMA, opt state
    — the DDP layout)."""
    rep = replicate(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)
