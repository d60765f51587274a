"""trainer.fold_accumulation_into_batch — accumulation as physical batch.

The reference trains with Lightning gradient accumulation (OISST acc=4,
NS acc=2 — ``configs/experiment/*.yaml``); optax.MultiSteps reproduces it.
On TPU the SAME effective batch runs measurably faster as ONE physical batch
(bigger batches fill the MXU's M-tiling — PERF.md's B64->B128 train-MFU
doubling), and the gradient is mathematically identical: the mean over
batch x acc rows equals the mean of the k equal-size micro-batch means.
These tests pin (1) that optimizer-math identity through the REAL train step,
(2) run-identity invariance (folded and unfolded runs are the same science and
share a run id), and (3) the driver wiring.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from dyffusion_tpu.config import get_config
from dyffusion_tpu.interface import run_experiment
from dyffusion_tpu.training.optim import build_optimizer
from dyffusion_tpu.training.state import TrainState
from dyffusion_tpu.training.trainer import make_train_step
from dyffusion_tpu.utils.naming import get_run_id

TINY = [
    "datamodule.n_traj=4",
    "datamodule.n_time=14",
    "datamodule.spatial=(8,8)",
    "datamodule.channels=1",
    "datamodule.horizon=4",
    "datamodule.batch_size=4",
    "datamodule.eval_batch_size=4",
    "model.dim=8",
    "model.dim_mults=(1,)",
    "module.num_predictions=2",
    "trainer.save_checkpoints=False",
    "trainer.max_epochs=1",
    "trainer.max_steps=2",
]


def _make_state(accumulate: int, use_ema: bool = False, fold_factor: int = 1) -> TrainState:
    params = {"w": jnp.ones((3, 5)) * 0.1, "b": jnp.zeros((5,))}
    tx = build_optimizer(
        name="adamw", lr=1e-2, gradient_clip_val=1.0,
        accumulate_grad_batches=accumulate,
    )
    return TrainState.create(
        params=params, tx=tx, rng=jax.random.key(0),
        use_ema=use_ema, ema_decay=0.5, fold_factor=fold_factor,
    )


def _loss_fn(variables, batch, rng):
    # deterministic regression loss (mean over rows) — rng unused so the
    # micro/folded comparison is exact, not statistical
    pred = batch["x"] @ variables["params"]["w"] + variables["params"]["b"]
    loss = jnp.mean((pred - batch["y"]) ** 2)
    return loss, ({"loss": loss}, {})


def test_folded_step_equals_accumulated_micro_steps():
    """k micro-steps through MultiSteps(k) == ONE folded step at k x B,
    through the real jitted train step (grad mean + clip + adamw + step)."""
    k, B = 4, 8
    rs = np.random.RandomState(0)
    X = rs.randn(k * B, 3).astype(np.float32)
    Y = rs.randn(k * B, 5).astype(np.float32)

    step = make_train_step(_loss_fn)

    acc_state = _make_state(accumulate=k)
    for i in range(k):
        sl = slice(i * B, (i + 1) * B)
        acc_state, _ = step(acc_state, {"x": jnp.asarray(X[sl]), "y": jnp.asarray(Y[sl])})

    fold_state = _make_state(accumulate=1)
    fold_state, _ = step(fold_state, {"x": jnp.asarray(X), "y": jnp.asarray(Y)})

    for p_acc, p_fold in zip(
        jax.tree_util.tree_leaves(acc_state.params),
        jax.tree_util.tree_leaves(fold_state.params),
    ):
        np.testing.assert_allclose(np.asarray(p_acc), np.asarray(p_fold), atol=1e-6)


def test_folded_ema_trajectory_matches_micro_cadence():
    """The unfolded run updates the EMA once per MICRO-batch (Lightning's
    on_train_batch_end under accumulation: k-1 updates against unchanged
    params, then one against the stepped params — our MultiSteps path does
    exactly this). The folded step replays that cadence via
    TrainState.fold_factor, so EMA trajectories are IDENTICAL — warmup
    decays included (ema_decay=0.5 keeps warmup active past step 10)."""
    k, B, cycles = 4, 8, 3
    rs = np.random.RandomState(1)
    X = rs.randn(cycles * k * B, 3).astype(np.float32)
    Y = rs.randn(cycles * k * B, 5).astype(np.float32)

    step = make_train_step(_loss_fn)

    acc_state = _make_state(accumulate=k, use_ema=True)
    for i in range(cycles * k):
        sl = slice(i * B, (i + 1) * B)
        acc_state, _ = step(acc_state, {"x": jnp.asarray(X[sl]), "y": jnp.asarray(Y[sl])})

    fold_state = _make_state(accumulate=1, use_ema=True, fold_factor=k)
    for c in range(cycles):
        sl = slice(c * k * B, (c + 1) * k * B)
        fold_state, _ = step(fold_state, {"x": jnp.asarray(X[sl]), "y": jnp.asarray(Y[sl])})

    assert int(acc_state.ema_num_updates) == int(fold_state.ema_num_updates) == cycles * k
    # step counts micro-batches in both layouts (max_steps/resume parity)
    assert int(acc_state.step) == int(fold_state.step) == cycles * k
    for a, f in zip(
        jax.tree_util.tree_leaves(acc_state.ema_params),
        jax.tree_util.tree_leaves(fold_state.ema_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(f), atol=1e-6)
    for a, f in zip(
        jax.tree_util.tree_leaves(acc_state.params),
        jax.tree_util.tree_leaves(fold_state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(f), atol=1e-6)


def test_run_id_invariant_under_fold():
    """Folded and unfolded configs are the same optimization: same run id.
    Changing the EFFECTIVE batch is different science: different id.
    model.remat is pure execution schedule: same id. With EMA ON, the EMA
    cadence (updates per effective batch) IS science: manual re-batching
    (B128 x acc2 vs B64 x acc4) forks the id, while the fold flag (which
    replays the cadence) does not."""
    base = TINY + ["trainer.accumulate_grad_batches=4"]
    cfg_unfolded = get_config("synthetic_interpolation", base)
    cfg_folded = get_config(
        "synthetic_interpolation", base + ["trainer.fold_accumulation_into_batch=True"]
    )
    assert get_run_id(cfg_unfolded) == get_run_id(cfg_folded)

    cfg_other = get_config(
        "synthetic_interpolation", TINY + ["trainer.accumulate_grad_batches=2"]
    )
    assert get_run_id(cfg_unfolded) != get_run_id(cfg_other)

    # remat: same forward function, different execution schedule -> same id
    cfg_remat = get_config(
        "synthetic_interpolation",
        base + ["trainer.fold_accumulation_into_batch=True", "model.remat=True"],
    )
    assert get_run_id(cfg_remat) == get_run_id(cfg_unfolded)

    # EMA off (default): manual partial re-batching keeps the id
    rebatch = [o for o in TINY if not o.startswith("datamodule.batch_size")]
    cfg_manual = get_config(
        "synthetic_interpolation",
        rebatch + ["datamodule.batch_size=8", "trainer.accumulate_grad_batches=2"],
    )
    assert get_run_id(cfg_manual) == get_run_id(cfg_unfolded)

    # EMA on: the cadence differs (2 vs 4 updates per effective batch) -> fork
    cfg_manual_ema = get_config(
        "synthetic_interpolation",
        rebatch + [
            "datamodule.batch_size=8", "trainer.accumulate_grad_batches=2",
            "module.use_ema=True",
        ],
    )
    cfg_unfolded_ema = get_config("synthetic_interpolation", base + ["module.use_ema=True"])
    assert get_run_id(cfg_manual_ema) != get_run_id(cfg_unfolded_ema)
    # ...but the fold flag preserves the cadence -> same id
    cfg_folded_ema = get_config(
        "synthetic_interpolation",
        base + ["module.use_ema=True", "trainer.fold_accumulation_into_batch=True"],
    )
    assert get_run_id(cfg_folded_ema) == get_run_id(cfg_unfolded_ema)


def test_folded_run_reloads_in_test_mode(tmp_path):
    """A run trained WITH fold must reload for mode=test: create_train_state
    normalizes the fold from the stored config, so the opt-state restore
    template matches what the folded run saved (review finding: orbax
    structure mismatch crash)."""
    from dyffusion_tpu.interface import reload_and_test

    cfg = get_config(
        "synthetic_interpolation",
        [o for o in TINY if not o.startswith("trainer.save_checkpoints")] + [
            "trainer.accumulate_grad_batches=2",
            "trainer.fold_accumulation_into_batch=True",
            f"registry_dir={tmp_path}",
        ],
    )
    trainer, best = run_experiment(cfg)
    run_id = os.path.basename(trainer.ckpt.run_dir)
    metrics = reload_and_test(
        str(tmp_path), run_id, overrides=["module.num_predictions=2"]
    )
    assert np.isfinite(metrics["test/crps"])


def test_resume_across_layouts(tmp_path):
    """Checkpoints are layout-invariant (canonical inner opt state): a run
    trained unfolded resumes folded and vice versa — the same run id invites
    exactly this toggle."""
    base = [o for o in TINY if not o.startswith(("trainer.save_checkpoints", "trainer.max_steps"))] + [
        "trainer.accumulate_grad_batches=2",
        f"registry_dir={tmp_path}",
    ]
    cfg = get_config("synthetic_interpolation", base + ["trainer.max_epochs=1"])
    trainer1, _ = run_experiment(cfg)
    step1 = int(trainer1.state.step)
    assert step1 > 0

    # relaunch the SAME science with the fold flag and one more epoch:
    # must resume the same run dir and continue the step counter (in
    # micro-batch units) instead of crashing on the opt-state template
    cfg2 = get_config(
        "synthetic_interpolation",
        base + ["trainer.max_epochs=2", "trainer.fold_accumulation_into_batch=True"],
    )
    trainer2, best2 = run_experiment(cfg2)
    assert trainer2.ckpt.run_dir == trainer1.ckpt.run_dir
    assert int(trainer2.state.step) > step1
    assert np.isfinite(best2)


def test_oversized_folded_batch_fails_loudly(tmp_path):
    """batch x acc > train rows would drop_last EVERY batch — the trainer
    raises instead of silently training zero steps per epoch."""
    import pytest

    cfg = get_config(
        "synthetic_interpolation",
        TINY + [
            "trainer.accumulate_grad_batches=64",
            "trainer.fold_accumulation_into_batch=True",
            f"registry_dir={tmp_path}",
        ],
    )
    with pytest.raises(ValueError, match="0 batches"):
        run_experiment(cfg)


def test_driver_folds_accumulation(tmp_path):
    cfg = get_config(
        "synthetic_interpolation",
        TINY + [
            "trainer.accumulate_grad_batches=2",
            "trainer.fold_accumulation_into_batch=True",
            f"registry_dir={tmp_path}",
        ],
    )
    trainer, best = run_experiment(cfg)
    # physical batch = batch_size x accumulate; optimizer steps every batch
    assert trainer.datamodule.batch_size == 8
    assert np.isfinite(best)
