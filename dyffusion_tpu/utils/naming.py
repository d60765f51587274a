"""Deterministic run/group naming.

Capability parity with ``src/utilities/naming.py:46-306``: run names encode
the salient hyperparameters so that runs are identifiable and resumable by
name (the reference's resume-by-group mechanism, ``config_utils.py:230-270``).
"""
from __future__ import annotations

import hashlib
import json
from typing import Any, Dict


def clean_name(s: str) -> str:
    return str(s).replace(" ", "").replace("/", "-").replace(":", "-")


def get_group_name(config: Dict[str, Any]) -> str:
    """Hparams-derived group name (ref ``naming.py:280``)."""
    dm = config.get("datamodule", {})
    md = config.get("model", {})
    parts = [
        clean_name(dm.get("name", "data")),
        clean_name(config.get("experiment", "exp")),
        clean_name(md.get("name", "model")),
        f"h{dm.get('horizon', '?')}",
        f"w{dm.get('window', 1)}",
    ]
    diff = config.get("diffusion")
    if diff:
        parts.append(clean_name(diff.get("name", "diffusion")))
        if diff.get("additional_interpolation_steps"):
            parts.append(f"k{diff['additional_interpolation_steps']}")
        if diff.get("forward_conditioning") and diff["forward_conditioning"] != "data":
            parts.append(clean_name(diff["forward_conditioning"]))
    name = "_".join(parts)
    return name[:100]  # W&B-style 128-char guard (ref naming.py:233-238)


# Keys that do not define the run's scientific identity: schedule length,
# logging/eval cadence, and machine-local paths. Excluded from the id hash so
# that (a) raising max_epochs EXTENDS a run instead of forking a new one
# (Lightning's resume semantics) and (b) moving a registry directory does not
# orphan every run in it. Mirrors the reference's duplicate-run detection,
# which compares science hparams only (ref ``config_utils.py:242-283``).
_VOLATILE_TOP = ("registry_dir", "preset", "use_wandb", "run_id", "mode", "debug",
                 # perf selects an execution-layout recipe (config._PERF_MEASURED)
                 # whose knobs are themselves volatile or enter via
                 # effective_train_batch — the mode name must not fork the id
                 "perf")
_VOLATILE_TRAINER = (
    "max_epochs",
    "max_steps",
    "val_every_n_epochs",
    "devices",
    "save_checkpoints",
    "log_every_n_steps",
    "watch_gradients",
    "early_stopping_patience",
    "num_sanity_val_steps",
    # execution layout, not science: both enter the id only through
    # effective_train_batch (batch x data-axis x accumulation), so
    # batch=64/acc=4 and batch=256/acc=1 (the fold_accumulation_into_batch
    # throughput lever) are the same optimization and share a run id
    "accumulate_grad_batches",
    "fold_accumulation_into_batch",
    # spatial (model-axis) sharding splits each example's grid over chips —
    # identical math per example (test_spatial_parallel.py proves sharded ==
    # single-device); only the data-axis size it leaves is science, via
    # effective_train_batch below
    "spatial_shards",
    "spatial_axis",
)
_VOLATILE_DATAMODULE = ("eval_batch_size", "num_workers", "data_dir", "batch_size")
# model-section keys that change the execution schedule, not the function the
# network computes: remat recomputes identical activations in the backward
_VOLATILE_MODEL = ("remat",)


def _data_axis_size(config: Dict[str, Any]) -> int:
    """Resolve the DATA axis of the mesh the way ``interface._build_mesh``
    does: ``trainer.devices`` divided by ``trainer.spatial_shards`` (the
    model axis holds grid shards, not extra batch rows — the global batch
    scales by the data axis only, ``interface.run_experiment``)."""
    tr = config.get("trainer") or {}
    devices = tr.get("devices", "auto")
    if devices in ("auto", -1, None):
        import jax

        n = jax.device_count() if jax.default_backend() != "cpu" else 1
    else:
        n = max(int(devices), 1)
    return max(n // max(int(tr.get("spatial_shards", 1) or 1), 1), 1)


def identity_config(config: Dict[str, Any]) -> Dict[str, Any]:
    """The subset of the config that defines run identity (see above).

    ``trainer.devices`` itself is volatile, but the GLOBAL train batch it
    implies (per-device batch x data-axis size — ``interface.py`` eff-batch
    scaling) is science: devices=8/batch=8 and devices=1/batch=64 are the
    same optimization and share an id, while devices=1 vs devices=8 at the
    same per-device batch are different runs and must not resume each other.
    """
    cfg = {k: v for k, v in config.items() if k not in _VOLATILE_TOP}
    for section, volatile in (
        ("trainer", _VOLATILE_TRAINER),
        ("datamodule", _VOLATILE_DATAMODULE),
        ("model", _VOLATILE_MODEL),
    ):
        if isinstance(cfg.get(section), dict):
            cfg[section] = {k: v for k, v in cfg[section].items() if k not in volatile}
    per_device = (config.get("datamodule") or {}).get("batch_size")
    acc = int((config.get("trainer") or {}).get("accumulate_grad_batches", 1) or 1)
    if per_device is not None:
        cfg["effective_train_batch"] = int(per_device) * _data_axis_size(config) * acc
    # EMA cadence IS science when EMA is on: the shadow updates once per
    # micro-batch (warmup counter included), so B64 x acc4 (4 updates per
    # effective batch — folded or not, the fold replays them) and B128 x acc2
    # (2 updates) are different EMA trajectories and must not share a run id.
    # With EMA off the layout is trajectory-free and stays un-hashed.
    if (config.get("module") or {}).get("use_ema"):
        cfg["ema_updates_per_effective_batch"] = acc
    return cfg


def get_run_id(config: Dict[str, Any]) -> str:
    """Deterministic run id = group name + seed + short config hash, so a
    relaunch with identical science config resumes the same run directory (the
    duplicate-run detection of ``config_utils.py:242-283``)."""
    group = get_group_name(config)
    seed = config.get("seed", 0)
    digest = hashlib.sha256(
        json.dumps(identity_config(config), sort_keys=True, default=str).encode()
    ).hexdigest()[:8]
    return f"{group}_seed{seed}_{digest}"
