"""Round-4 fixes: resume behavior on a registry synced without checkpoint
blobs (the ``runs_flagship`` layout — metrics/meta committed, ``best/`` and
``last/`` gitignored).
"""
import os
import shutil

import numpy as np

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


def test_rerun_on_run_dir_without_checkpoint_blobs(tmp_path):
    """A run dir with meta.json (incl. a recorded best_score) but NO
    checkpoint slots must retrain from scratch AND write a fresh best slot —
    the ghost best_score must not suppress it (interface.run_experiment
    clears the stale meta when there is nothing to resume)."""
    reg = str(tmp_path / "reg")
    ov = TINY + [f"registry_dir={reg}"]
    trainer1, best1 = run_experiment(get_config("synthetic_interpolation", ov))
    run_dir = trainer1.ckpt.run_dir
    assert np.isfinite(best1)

    # simulate the fresh-checkout registry: meta/metrics survive, blobs don't
    shutil.rmtree(os.path.join(run_dir, "best"))
    shutil.rmtree(os.path.join(run_dir, "last"))

    trainer2, best2 = run_experiment(get_config("synthetic_interpolation", ov))
    assert trainer2.ckpt.run_dir == run_dir
    # trained fresh (not fast-forwarded off the stale epochs_done)...
    assert len(trainer2.history) == 2
    assert int(trainer2.state.step) > 0
    # ...and the best slot exists again even if this run scored no better
    # than the ghost meta best_score
    assert trainer2.ckpt.has("best") and trainer2.ckpt.has("last")
    assert np.isfinite(best2)

    # round-5 (ADVICE r4): reset_run_state rotates the old metric stream so
    # metrics.jsonl holds exactly ONE monotone run — consumers like
    # registry_api.get_run_metrics assume one run per file
    import json

    rotated = os.path.join(run_dir, "metrics.jsonl.1")
    assert os.path.exists(rotated), "old metrics stream should be rotated aside"
    steps = []
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "step" in rec:
                steps.append(rec["step"])
    assert steps == sorted(steps), f"metrics.jsonl not monotone: {steps}"

    # curves/ from the OLD run's weights must be rotated too (round-5 review:
    # stale test curves would be attributed to the new run)
    os.makedirs(os.path.join(run_dir, "curves"), exist_ok=True)
    trainer2.ckpt.reset_run_state()
    assert not os.path.exists(os.path.join(run_dir, "curves"))
    assert os.path.isdir(os.path.join(run_dir, "curves.1"))
