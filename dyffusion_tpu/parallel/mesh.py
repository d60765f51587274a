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
import jax.numpy as jnp
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


def process_local_rows(global_shape, sharding) -> slice:
    """Row slice (axis 0) of a globally row-sharded array owned by THIS
    process, derived from the sharding's own device->index map (not assumed).

    Every host materializes batches with GLOBAL indices (identical shuffle
    permutations from identically-seeded rngs — the analogue of the
    reference's DistributedSampler seed contract under Lightning DDP,
    ``configs/trainer/ddp.yaml:5``); this slice is the only part each host
    transfers to its chips.
    """
    idx_map = sharding.addressable_devices_indices_map(tuple(global_shape))
    n = int(global_shape[0])
    spans = set()
    for idx in idx_map.values():
        r = idx[0]
        spans.add((r.start or 0, n if r.stop is None else r.stop))
    spans = sorted(spans)
    lo, hi = spans[0][0], spans[-1][1]
    # the process's rows must be contiguous for a single np slice
    cursor = lo
    for start, stop in spans:
        assert start == cursor, (
            f"non-contiguous process-local rows {spans}; this sharding cannot "
            "be fed from a contiguous per-process slice"
        )
        cursor = stop
    assert cursor == hi
    return slice(lo, hi)


def put_array(v: Any, sharding: NamedSharding):
    """ONE code path for 1..N processes: place a GLOBAL host array sharded
    over the data axis. Under multi-process each host transfers only its
    process-local row slice (``jax.make_array_from_process_local_data``)."""
    v = np.asarray(v)
    if jax.process_count() > 1:
        sl = process_local_rows(v.shape, sharding)
        return jax.make_array_from_process_local_data(sharding, v[sl], v.shape)
    return jax.device_put(v, sharding)


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch sharded over the data axis. Under multi-host each
    process contributes its own row slice (see :func:`put_array`)."""
    sh = batch_sharding(mesh)
    return {k: put_array(v, sh) for k, v in batch.items()}


def put_replicated(x, rep: NamedSharding):
    """Place one value fully replicated over a (possibly multi-process) mesh.

    ``jax.device_put`` rejects shardings that span non-addressable devices, so
    under multi-process the global array is assembled with
    ``make_array_from_callback`` (each process supplies its addressable
    replicas; replication requires no communication — every host already
    holds the full value). Typed PRNG keys are unwrapped/rewrapped since
    their raw data carries a trailing impl dimension.
    """
    if jax.process_count() <= 1:
        return jax.device_put(x, rep)
    if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
        data = np.asarray(jax.random.key_data(x))
        raw = jax.make_array_from_callback(data.shape, rep, lambda idx: data[idx])
        return jax.random.wrap_key_data(raw)
    v = np.asarray(x)
    return jax.make_array_from_callback(v.shape, rep, lambda idx: v[idx])


def shard_train_state(state, mesh: Mesh):
    """Replicate the whole train state over the mesh (params, EMA, opt state
    — the DDP layout)."""
    rep = replicate(mesh)
    return jax.tree_util.tree_map(lambda x: put_replicated(x, rep), state)
