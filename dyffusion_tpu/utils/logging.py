"""Metrics logging and observability.

Replaces the reference's W&B-centric stack (``src/utilities/wandb_callbacks.py``,
``config_utils.log_hyperparameters :507-585``) with a local-first design:

- :class:`MetricsLogger` — JSONL metric stream + per-run hyperparameter
  snapshot in the run directory, with an OPTIONAL wandb mirror when the
  package is importable (the reference's logger is wandb-only);
- :func:`save_arrays_as_line_plot` — per-horizon metric curves persisted as
  npz + json tables (the local analogue of the reference's custom-step wandb
  charts, ``wandb_callbacks.py:102-150``);
- rank-zero guard for multi-host runs (``utils.get_logger :295-305``).
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, Optional

import numpy as np


def is_rank_zero() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def get_logger(name: str = "dyffusion_tpu") -> logging.Logger:
    """Rank-zero-guarded python logger (ref ``utils.py:295-305``)."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("[%(asctime)s %(name)s %(levelname)s] %(message)s"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO if is_rank_zero() else logging.WARNING)
    return logger


class MetricsLogger:
    """JSONL metrics + hparams snapshot (+ optional wandb mirror)."""

    def __init__(self, run_dir: str, use_wandb: bool = False, wandb_kwargs: Optional[dict] = None):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, "metrics.jsonl")
        self._wandb = None
        if use_wandb and is_rank_zero():
            try:
                import wandb

                self._wandb = wandb.init(dir=run_dir, **(wandb_kwargs or {}))
            except Exception:  # wandb not installed / offline
                self._wandb = None

    def log_hyperparams(self, config: Dict[str, Any]) -> None:
        if not is_rank_zero():
            return
        with open(os.path.join(self.run_dir, "hparams.json"), "w") as f:
            json.dump(config, f, indent=2, default=str)
        if self._wandb is not None:
            self._wandb.config.update(config, allow_val_change=True)

    def log(self, metrics: Dict[str, float], step: int) -> None:
        if not is_rank_zero():
            return
        record = {"step": int(step), "time": time.time()}
        record.update({k: (float(v) if np.isscalar(v) or hasattr(v, "item") else v) for k, v in metrics.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(record, default=str) + "\n")
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()


def save_arrays_as_line_plot(
    run_dir: str,
    x: np.ndarray,
    metrics: Dict[str, np.ndarray],
    key_stem: str,
    x_label: str = "horizon",
) -> str:
    """Persist per-horizon metric curves (ref ``wandb_callbacks.py:102-150``):
    one npz with the arrays + a json table for quick inspection."""
    safe = key_stem.replace("/", "_").strip("_")
    out_dir = os.path.join(run_dir, "curves")
    os.makedirs(out_dir, exist_ok=True)
    np.savez(os.path.join(out_dir, f"{safe}.npz"), **{x_label: np.asarray(x)}, **{k: np.asarray(v) for k, v in metrics.items()})
    table = {x_label: np.asarray(x).tolist(), **{k: np.asarray(v).tolist() for k, v in metrics.items()}}
    with open(os.path.join(out_dir, f"{safe}.json"), "w") as f:
        json.dump(table, f)
    return out_dir
