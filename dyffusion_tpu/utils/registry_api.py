"""Local run-registry queries and analytics.

Capability parity with the reference's W&B API layer
(``src/utilities/wandb_api.py:328-975``): resolve runs by id/group, reload
their configs and best checkpoints, and aggregate metrics across runs into
tables — against the local registry written by the trainer
(``<registry>/<run_id>/{config.json, meta.json, metrics.jsonl, best, last}``)
instead of the W&B cloud.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional


def list_runs(registry_dir: str) -> List[str]:
    """All run ids in the registry (ref run queries ``wandb_api.py:394-560``)."""
    if not os.path.isdir(registry_dir):
        return []
    return sorted(
        d for d in os.listdir(registry_dir)
        if os.path.isdir(os.path.join(registry_dir, d))
        and os.path.exists(os.path.join(registry_dir, d, "config.json"))
    )


def get_run_config(registry_dir: str, run_id: str) -> Dict[str, Any]:
    with open(os.path.join(registry_dir, run_id, "config.json")) as f:
        return json.load(f)


def get_run_meta(registry_dir: str, run_id: str) -> Dict[str, Any]:
    path = os.path.join(registry_dir, run_id, "meta.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def get_run_metrics(registry_dir: str, run_id: str) -> List[Dict[str, Any]]:
    """The run's full metric stream (JSONL records)."""
    path = os.path.join(registry_dir, run_id, "metrics.jsonl")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def filter_runs(
    registry_dir: str,
    group_contains: Optional[str] = None,
    seed: Optional[int] = None,
    experiment: Optional[str] = None,
) -> List[str]:
    """Filter runs by name substring / seed / experiment type (the local
    analogue of group+seed duplicate-run detection, ``config_utils.py:242-283``)."""
    out = []
    for rid in list_runs(registry_dir):
        if group_contains and group_contains not in rid:
            continue
        cfg = get_run_config(registry_dir, rid)
        if seed is not None and cfg.get("seed") != seed:
            continue
        if experiment is not None and cfg.get("experiment") != experiment:
            continue
        out.append(rid)
    return out


def get_runs_summary(registry_dir: str, run_ids: Optional[List[str]] = None) -> List[Dict[str, Any]]:
    """One summary row per run: id, experiment, dataset, seed, best score +
    monitor, last step (the sweep-analytics table of ``get_runs_df``,
    ``wandb_api.py:736``; returns plain dicts — feed to pandas if desired)."""
    rows = []
    for rid in run_ids or list_runs(registry_dir):
        cfg = get_run_config(registry_dir, rid)
        meta = get_run_meta(registry_dir, rid)
        rows.append(
            {
                "run_id": rid,
                "experiment": cfg.get("experiment"),
                "dataset": cfg.get("datamodule", {}).get("name"),
                "seed": cfg.get("seed"),
                "monitor": meta.get("best_monitor"),
                "best_score": meta.get("best_score"),
                "best_step": meta.get("best_step"),
                "last_step": meta.get("last_step"),
            }
        )
    return rows


def metrics_of_runs_to_arrays(
    registry_dir: str, run_ids: List[str], metric: str
) -> Dict[str, List]:
    """Collect one metric's (step, value) series for several runs
    (ref ``metrics_of_runs_to_arrays``, ``wandb_api.py:899``)."""
    out = {}
    for rid in run_ids:
        series = [
            (r["step"], r[metric]) for r in get_run_metrics(registry_dir, rid) if metric in r
        ]
        out[rid] = series
    return out
