"""Round-3 review fixes: distributed-init idempotency, crash-save epoch
metadata, and run-identity vs device count (see PERF.md / commit history).
"""
import json
import os

import numpy as np
import pytest

from dyffusion_tpu.config import get_config
from dyffusion_tpu.interface import run_experiment

TINY = [
    "datamodule.n_traj=4",
    "datamodule.n_time=16",
    "datamodule.spatial=(8,8)",
    "datamodule.channels=1",
    "datamodule.horizon=3",
    "datamodule.batch_size=4",
    "model.dim=8",
    "model.dim_mults=(1,)",
    "module.num_predictions=2",
    "trainer.max_epochs=2",
]


def test_init_distributed_idempotent(monkeypatch):
    """Drivers that train then reload-and-test in one process call
    init_distributed() twice; jax.distributed.initialize() may only ever run
    once, so the second call must no-op."""
    import jax

    from dyffusion_tpu.parallel.distributed import init_distributed

    calls = []
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: True)
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: calls.append(kw)
    )
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:9999")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    monkeypatch.setenv("JAX_PROCESS_ID", "0")
    init_distributed()  # already initialized -> must not call initialize()
    assert calls == []


def test_crash_save_writes_matching_epochs_done(tmp_path, monkeypatch):
    """A crash mid-run must persist epochs_done alongside the 'last' params it
    snapshots — a stale count would make resume replay finished epochs on top
    of weights that already contain them."""
    from dyffusion_tpu.training.trainer import Trainer

    # crash at the SECOND epoch's validation: epoch 0 completed + saved
    # normally (val_every_n_epochs=1), epoch 1's train steps ran, then boom
    real_evaluate = Trainer.evaluate
    state = {"n": 0}

    def exploding_evaluate(self, split="val"):
        state["n"] += 1
        if state["n"] >= 2:
            raise RuntimeError("injected crash")
        return real_evaluate(self, split)

    monkeypatch.setattr(Trainer, "evaluate", exploding_evaluate)
    cfg = get_config(
        "synthetic_interpolation",
        TINY + [f"registry_dir={tmp_path}", "trainer.max_epochs=3"],
    )
    with pytest.raises(RuntimeError, match="injected crash"):
        run_experiment(cfg)

    run_dir = next(p for p in (tmp_path).iterdir() if p.is_dir())
    meta = json.loads((run_dir / "meta.json").read_text())
    # epoch 0 fully done; epoch 1 completed its batches before the val crash
    assert meta["epochs_done"] == 2
    # the crash-path 'last' save recorded the crash-time step, not epoch 0's
    assert meta["last_step"] > 0
    assert os.path.isdir(run_dir / "last")

    # resume trains ONLY the remaining epoch (start at epoch 2 of 3)
    monkeypatch.setattr(Trainer, "evaluate", real_evaluate)
    trainer2, best2 = run_experiment(cfg)
    assert [h["epoch"] for h in trainer2.history] == [2]
    assert np.isfinite(best2)


def test_run_identity_includes_effective_batch():
    """devices=8/batch=8 and devices=1/batch=64 are the same science (same
    global batch) -> same id; same per-device batch at different device
    counts differs -> different runs that must not resume each other."""
    from dyffusion_tpu.utils.naming import get_run_id

    a = get_run_id(
        get_config("synthetic_interpolation", TINY + ["trainer.devices=8", "datamodule.batch_size=8"])
    )
    b = get_run_id(
        get_config("synthetic_interpolation", TINY + ["trainer.devices=1", "datamodule.batch_size=64"])
    )
    c = get_run_id(
        get_config("synthetic_interpolation", TINY + ["trainer.devices=1", "datamodule.batch_size=8"])
    )
    assert a == b
    assert c != a


def test_epochs_completed_tracks_partial_epochs(tmp_path):
    """max_steps breaking mid-epoch leaves that epoch out of the count, so a
    mid-epoch out-of-band save resumes at the interrupted epoch's start."""
    cfg = get_config(
        "synthetic_interpolation",
        TINY + [f"registry_dir={tmp_path}", "trainer.max_steps=3", "trainer.save_checkpoints=False"],
    )
    trainer, _ = run_experiment(cfg)
    # 4 traj x (16-3) windows... batch 4 -> >3 steps per epoch: break mid-epoch 0
    assert trainer.epochs_completed == 0
    assert int(trainer.state.step) == 3
