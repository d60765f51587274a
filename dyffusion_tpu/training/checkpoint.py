"""Checkpointing and the local run registry.

Capability parity with the reference's three cooperating mechanisms
(SURVEY.md §5.4; ``configs/callbacks/default.yaml``, ``wandb_callbacks.py:153-189``,
``train.py:44-69``): best-by-monitor + last checkpoints in a per-run directory,
metadata embedded alongside, and reload of (state, config) by run directory —
the local-registry replacement for W&B cloud restore.

Uses orbax for the array state and a JSON sidecar for config/metadata.
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _tree_to_saveable(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


class CheckpointManager:
    """Per-run checkpoint directory with 'last' and 'best' slots
    (ref ``ModelCheckpoint`` top-1-by-monitor + last; per-run subdir
    ``config_utils.py:450-458``)."""

    def __init__(self, run_dir: str, monitor: str, mode: str = "min"):
        self.run_dir = os.path.abspath(run_dir)
        os.makedirs(self.run_dir, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.best_score: Optional[float] = None
        # PyTreeCheckpointer: supports template-free restore, which the
        # stage-1 -> stage-2 interpolator handoff relies on
        self._ckpt = ocp.PyTreeCheckpointer()
        # Multi-host: slot promotion and meta/config writes are rank-0-only,
        # and EVERY rank's restore()/epochs_done reads run_dir directly — the
        # registry must live on a filesystem all hosts share (the same
        # contract Lightning's ModelCheckpoint has on a pod). Verify it now
        # with a write-then-probe barrier rather than desynchronizing later
        # (ranks disagreeing on resume state would hang the first collective).
        if jax.process_count() > 1:
            self._assert_shared_filesystem()
        # reload best score if resuming
        meta = self._read_meta()
        if meta and meta.get("best_score") is not None:
            self.best_score = meta["best_score"]

    def _assert_shared_filesystem(self) -> None:
        from jax.experimental import multihost_utils

        probe = os.path.join(self.run_dir, ".shared_fs_probe")
        if jax.process_index() == 0:
            with open(probe, "w") as f:
                f.write("shared-filesystem probe (see CheckpointManager)")
        multihost_utils.sync_global_devices("ckpt_shared_fs_probe")
        visible = multihost_utils.process_allgather(
            np.array([os.path.exists(probe)], dtype=np.int32)
        )
        if int(np.min(visible)) == 0:
            raise RuntimeError(
                f"checkpoint dir {self.run_dir!r} is not visible from every "
                f"host (visibility per process: {visible.ravel().tolist()}). "
                "Multi-host runs require registry_dir on a shared filesystem "
                "(NFS/GCS-fuse); otherwise resume and reload_and_test "
                "desynchronize across hosts."
            )

    def _slot_dir(self, slot: str) -> str:
        return os.path.join(self.run_dir, slot)

    def _read_meta(self) -> Dict[str, Any]:
        path = os.path.join(self.run_dir, "meta.json")
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
        return {}

    def _write_meta(self, **updates) -> None:
        if jax.process_index() != 0:
            return
        meta = self._read_meta()
        meta.update(updates)
        with open(os.path.join(self.run_dir, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2, default=str)

    def save_config(self, config: Dict[str, Any]) -> None:
        """Persist the full run config (the local analogue of uploading
        hydra_config.yaml to the cloud, ``config_utils.py:588-608``)."""
        if jax.process_index() != 0:
            return
        with open(os.path.join(self.run_dir, "config.json"), "w") as f:
            json.dump(config, f, indent=2, default=str)

    def load_config(self) -> Dict[str, Any]:
        with open(os.path.join(self.run_dir, "config.json")) as f:
            return json.load(f)

    def _save_slot(self, slot: str, state_tree) -> None:
        path = self._slot_dir(slot)
        tmp = path + ".tmp"
        # ALL processes must call orbax save — it synchronizes hosts
        # internally and only the primary host writes data (returning early on
        # rank!=0 would deadlock its barriers). The train state is replicated
        # (DDP layout), so host arrays are identical across processes.
        self._ckpt.save(tmp, _tree_to_saveable(state_tree), force=True)
        # host-side promotion of tmp -> slot is rank-zero-only (orbax's save
        # barrier has completed on every process by this point)
        if jax.process_index() == 0:
            if os.path.exists(path):
                shutil.rmtree(path)
            os.replace(tmp, path)

    def save_last(self, state_tree, step: int, epochs_done: Optional[int] = None) -> None:
        self._save_slot("last", state_tree)
        if epochs_done is None:
            self._write_meta(last_step=step)
        else:
            self._write_meta(last_step=step, epochs_done=int(epochs_done))

    @property
    def epochs_done(self) -> int:
        """Completed-epoch count persisted with the 'last' slot, so a resumed
        run continues from the next epoch instead of re-running max_epochs
        more (the Lightning resume semantics, ref ``train.py:44-69``)."""
        return int(self._read_meta().get("epochs_done", 0))

    def is_improvement(self, score: float) -> bool:
        if self.best_score is None or np.isnan(self.best_score):
            return True
        return score < self.best_score if self.mode == "min" else score > self.best_score

    def save_best_if_improved(self, state_tree, score: float, step: int) -> bool:
        if not np.isfinite(score) or not self.is_improvement(score):
            return False
        self.best_score = float(score)
        self._save_slot("best", state_tree)
        self._write_meta(best_score=self.best_score, best_monitor=self.monitor, best_step=step)
        return True

    def restore(self, state_tree_template=None, slot: str = "last"):
        """Restore a checkpoint; with a template the result matches its
        structure, without one the raw stored tree is returned."""
        path = self._slot_dir(slot)
        if not os.path.exists(path):
            return None
        if state_tree_template is None:
            return self._ckpt.restore(path)
        return self._ckpt.restore(path, _tree_to_saveable(state_tree_template))

    def has(self, slot: str) -> bool:
        return os.path.exists(self._slot_dir(slot))

    def reset_run_state(self) -> None:
        """Start-over semantics (``run_experiment(resume=False)`` on a dir
        that already has state): clear the stale best/last slots and the meta
        counters so the fresh run neither inherits a best_score that
        suppresses its checkpoints nor crash-saves the OLD run's epochs_done
        next to NEW params."""
        self.best_score = None
        if jax.process_index() != 0:
            return
        for slot in ("best", "last"):
            path = self._slot_dir(slot)
            if os.path.exists(path):
                shutil.rmtree(path)
        # Rotate the old run's metric stream AND its persisted eval curves so
        # the fresh run's dir holds exactly one run's outputs: appending a
        # second run to metrics.jsonl breaks every consumer that assumes one
        # monotone run per file (registry_api.get_run_metrics, the curve
        # plots), and stale curves/ from the old weights would be attributed
        # to the new run until its own test pass overwrites them.
        for name in ("metrics.jsonl", "curves"):
            path = os.path.join(self.run_dir, name)
            if os.path.exists(path):
                n = 1
                while os.path.exists(f"{path}.{n}"):
                    n += 1
                os.replace(path, f"{path}.{n}")
        meta = self._read_meta()
        for key in ("best_score", "best_monitor", "best_step", "last_step", "epochs_done"):
            meta.pop(key, None)
        with open(os.path.join(self.run_dir, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2, default=str)


def find_run_dir(registry_dir: str, run_id: str) -> str:
    """Resolve a run id to its directory in the local registry
    (replaces W&B run-id resolution, ``wandb_api.py:328-381``)."""
    path = os.path.join(os.path.abspath(registry_dir), run_id)
    if not os.path.isdir(path):
        raise FileNotFoundError(f"run '{run_id}' not found under {registry_dir}")
    return path
