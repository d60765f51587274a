"""Device mesh + sharding for data-parallel training.

The reference's only parallelism is Lightning DDP (SURVEY.md §2.7:
``configs/trainer/ddp.yaml`` — replicated params, sharded batch, NCCL
all-reduce). The TPU-native equivalent: a 1-D ``Mesh(('data',))`` over all
chips, params/opt-state replicated, batch sharded on axis 0, and XLA inserts
the gradient all-reduce (psum over ICI) automatically when the jitted train
step consumes sharded batches with replicated params — no hand-written
collectives needed (the single-controller recipe of the scaling book).

The 'model' axis implements SPATIAL sharding (SURVEY.md §5.7's named
extension point, beyond the reference's DP-only scaling): batches are
sharded on their spatial H axis over 'model' (:func:`value_sharding`), and
XLA's GSPMD partitioner inserts the conv halo exchanges and the
attention/reduction collectives automatically — the scaling-book recipe
(annotate shardings, let XLA insert collectives over ICI). Params stay
replicated. Size 1 (off) for all reference-parity workloads; enable with
``trainer.spatial_shards=K``.

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


def value_sharding(
    mesh: Mesh, ndim: int, spatial: bool = False, axis: str = "h"
) -> NamedSharding:
    """Sharding for one batch value: axis 0 over 'data', and — when
    ``spatial`` and the value has a spatial grid (ndim >= 4, layouts
    ``(B, H, W, C)`` / ``(B, T, H, W, C)``) — the H axis (always ndim-3) or,
    with ``axis='w'``, the W axis (ndim-2) over 'model' (W is for grids whose
    H has no useful divisors, e.g. Navier-Stokes 221x42). Sub-4-D values
    (times, masks, scalars) replicate over 'model'. The sharded extent must
    be divisible by the model-axis size (``jax.device_put`` rejects uneven
    shardings); the driver validates this up front.
    """
    if not spatial or ndim < 4:
        return NamedSharding(mesh, P("data"))
    assert axis in ("h", "w"), f"spatial axis must be 'h' or 'w', got {axis!r}"
    pos = ndim - 3 if axis == "h" else ndim - 2
    spec = ["data"] + [None] * (pos - 1) + ["model"]
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def process_local_box(global_shape, sharding) -> tuple:
    """Slice box of a globally sharded array owned by THIS process, derived
    from the sharding's own device->index map (not assumed). Per axis, the
    union of this process's shard spans must be contiguous (a box).

    Every host materializes batches with GLOBAL indices (identical shuffle
    permutations from identically-seeded rngs — the analogue of the
    reference's DistributedSampler seed contract under Lightning DDP,
    ``configs/trainer/ddp.yaml:5``); this box is the only part each host
    transfers to its chips. Handles any mix of 'data' (axis 0) and spatial
    'model' (H axis) sharding.
    """
    idx_map = sharding.addressable_devices_indices_map(tuple(global_shape))
    box = []
    for axis, size in enumerate(global_shape):
        size = int(size)
        spans = set()
        for idx in idx_map.values():
            r = idx[axis]
            spans.add((r.start or 0, size if r.stop is None else r.stop))
        spans = sorted(spans)
        lo, hi = spans[0][0], spans[-1][1]
        cursor = lo
        for start, stop in spans:
            assert start <= cursor, (
                f"non-contiguous process-local spans {spans} on axis {axis}; "
                "this sharding cannot be fed from one contiguous box per process"
            )
            cursor = max(cursor, stop)
        assert cursor == hi
        box.append(slice(lo, hi))
    return tuple(box)


def process_local_rows(global_shape, sharding) -> slice:
    """Axis-0 slice of this process's box (see :func:`process_local_box`)."""
    return process_local_box(global_shape, sharding)[0]


def put_array(v: Any, sharding: NamedSharding):
    """ONE code path for 1..N processes: place a GLOBAL host array under any
    row/spatial sharding. Under multi-process each host transfers only its
    process-local box (``jax.make_array_from_process_local_data``)."""
    v = np.asarray(v)
    if jax.process_count() > 1:
        box = process_local_box(v.shape, sharding)
        return jax.make_array_from_process_local_data(sharding, v[box], v.shape)
    return jax.device_put(v, sharding)


def shard_batch(
    batch: Dict[str, Any], mesh: Mesh, spatial: bool = False, axis: str = "h"
) -> Dict[str, Any]:
    """Place a host batch sharded over the data axis (and, with ``spatial``,
    grid values' H or W over 'model'). Under multi-host each process
    contributes its own box (see :func:`put_array`)."""
    return {
        k: put_array(v, value_sharding(mesh, np.asarray(v).ndim, spatial, axis))
        for k, v in batch.items()
    }


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
