"""End-to-end slice: stage-1 interpolation training -> stage-2 DYffusion
training + sampling, all on tiny synthetic data (SURVEY.md §7.2 steps 4-5).
"""
import os

import jax
import numpy as np
import pytest

from dyffusion_tpu.config import get_config
from dyffusion_tpu.interface import (
    build_experiment,
    get_datamodule,
    load_interpolator_from_registry,
    run_experiment,
)

TINY = [
    "datamodule.n_traj=6",
    "datamodule.n_time=20",
    "datamodule.spatial=(8,8)",
    "datamodule.channels=2",
    "datamodule.horizon=4",
    "datamodule.batch_size=8",
    "model.dim=8",
    "model.dim_mults=(1,)",
    "model.block_dropout=0.2",
    "module.num_predictions=3",
    "module.num_predictions_test=4",
    "trainer.max_epochs=2",
    "trainer.val_every_n_epochs=2",
]


@pytest.fixture(scope="module")
def stage1(tmp_path_factory):
    """Train a tiny interpolator and return (config, run_dir, trainer)."""
    registry = str(tmp_path_factory.mktemp("registry"))
    cfg = get_config("synthetic_interpolation", TINY + [f"registry_dir={registry}"])
    trainer, best = run_experiment(cfg)
    assert np.isfinite(best)
    return cfg, registry, trainer


def test_stage1_interpolation_trains(stage1):
    cfg, registry, trainer = stage1
    hist = trainer.history
    assert len(hist) == 2
    assert all(np.isfinite(h["train/loss_epoch"]) for h in hist)
    # validation produced per-t and aggregate ensemble metrics
    val_keys = [k for h in hist for k in h if k.startswith("val/")]
    assert any("crps" in k for k in val_keys)
    assert any(k == "val/t1/mse" for k in val_keys)
    # checkpoints written
    assert trainer.ckpt.has("last") and trainer.ckpt.has("best")


def test_stage2_dyffusion_with_registry_handoff(stage1):
    cfg1, registry, tr1 = stage1
    run_id = os.path.basename(tr1.ckpt.run_dir)
    # interpolator reload from registry (the stage-1 -> stage-2 handoff,
    # ref dyffusion.py:461-478)
    ip_apply, ip_vars, s1_cfg = load_interpolator_from_registry(registry, run_id)
    assert s1_cfg["experiment"] == "interpolation"

    cfg2 = get_config(
        "synthetic_dyffusion",
        TINY
        + [
            f"registry_dir={registry}",
            f"diffusion.interpolator_run_id={run_id}",
            "diffusion.lambda_reconstruction2=0.5",
            "trainer.max_epochs=1",
            "trainer.val_every_n_epochs=1",
        ],
    )
    trainer, best = run_experiment(cfg2)
    assert np.isfinite(best)
    # stage-2 eval produced predictions at every dynamical step
    val_metrics = trainer.evaluate("val")
    for i in range(1, 5):
        assert f"val/t{i}/mse" in val_metrics
    assert "val/crps" in val_metrics and np.isfinite(val_metrics["val/crps"])


def test_resume_from_checkpoint(stage1):
    cfg, registry, tr1 = stage1
    stored_best = tr1.ckpt.best_score
    # relaunch with identical config -> same run dir; epoch-aware resume
    # sees the run is complete (epochs_done == max_epochs), fast-forwards
    # without retraining, and returns the registry's best score
    trainer2, best2 = run_experiment(cfg)
    assert int(trainer2.state.step) == int(tr1.state.step) > 0
    assert trainer2.history == []
    assert best2 == pytest.approx(stored_best)
    # raising max_epochs trains ONLY the additional epochs, starting where
    # the saved run left off (Lightning resume semantics, ref train.py:44-69)
    cfg3 = get_config(
        "synthetic_interpolation",
        TINY + [f"registry_dir={registry}", "trainer.max_epochs=3"],
    )
    trainer3, best3 = run_experiment(cfg3)
    assert len(trainer3.history) == 1 and trainer3.history[0]["epoch"] == 2
    assert int(trainer3.state.step) > int(tr1.state.step)
    assert np.isfinite(best3)


def test_run_identity_excludes_volatile_keys():
    """Schedule length / machine paths don't fork a new run id; science does."""
    from dyffusion_tpu.utils.naming import get_run_id

    a = get_run_id(get_config("synthetic_interpolation", TINY))
    b = get_run_id(
        get_config(
            "synthetic_interpolation",
            TINY
            + [
                "trainer.max_epochs=9",
                "registry_dir=elsewhere",
                "datamodule.eval_batch_size=3",
            ],
        )
    )
    assert a == b
    c = get_run_id(get_config("synthetic_interpolation", TINY + ["model.dim=16"]))
    assert c != a


def test_time_conditioned_and_simultaneous_train():
    cfg_base = TINY + ["trainer.max_epochs=1", "trainer.save_checkpoints=False"]
    for preset in ("synthetic_time_conditioned", "synthetic_simultaneous"):
        cfg = get_config(preset, cfg_base)
        dm = get_datamodule(cfg)
        dm.setup()
        exp, model, variables, loss_fn, eval_fns, _ = build_experiment(cfg, dm)
        batch = next(iter(dm.train_batches()))
        import jax.numpy as jnp

        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        loss, (metrics, updates) = loss_fn(variables, batch, jax.random.key(0))
        assert np.isfinite(float(loss))
        out = eval_fns["val"](variables, batch, jax.random.key(1))
        assert f"t1_preds" in out and out["t1_preds"].shape[0] == 3  # members
