"""Trainer features: grad accumulation, early stopping, test-mode reload."""
import numpy as np
import pytest

from dyffusion_tpu.config import get_config
from dyffusion_tpu.interface import run_experiment, reload_and_test
from dyffusion_tpu.train import main as cli_main

TINY = [
    "datamodule.n_traj=5",
    "datamodule.n_time=16",
    "datamodule.spatial=(8,8)",
    "datamodule.channels=1",
    "datamodule.horizon=3",
    "datamodule.batch_size=4",
    "model.dim=8",
    "model.dim_mults=(1,)",
    "model.block_dropout=0.2",
    "module.num_predictions=2",
    "module.num_predictions_test=3",
    "trainer.max_epochs=2",
]


def test_gradient_accumulation_delays_param_updates(tmp_path):
    import jax.numpy as jnp
    import jax

    from dyffusion_tpu.interface import build_experiment, create_train_state, get_datamodule
    from dyffusion_tpu.training.trainer import make_train_step

    cfg = get_config(
        "synthetic_interpolation",
        TINY + [f"registry_dir={tmp_path}", "trainer.accumulate_grad_batches=2", "trainer.save_checkpoints=False"],
    )
    dm = get_datamodule(cfg)
    dm.setup()
    exp, model, variables, loss_fn, eval_fns, _ = build_experiment(cfg, dm)
    state = create_train_state(cfg, variables)
    step = make_train_step(loss_fn)
    batch = {k: jnp.asarray(v) for k, v in next(iter(dm.train_batches())).items()}
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    state, _ = step(state, batch)  # micro-step 1: params must NOT move yet
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    state, _ = step(state, batch)  # micro-step 2: accumulated update applies
    p2 = jax.tree_util.tree_leaves(state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p2))


def test_early_stopping_breaks_training(tmp_path):
    cfg = get_config(
        "synthetic_interpolation",
        TINY
        + [
            f"registry_dir={tmp_path}",
            "trainer.max_epochs=6",
            "trainer.val_every_n_epochs=1",
            "trainer.early_stopping_patience=1",
            "module.optimizer.lr=0.0",  # no learning => no improvement after epoch 1
        ],
    )
    trainer, best = run_experiment(cfg)
    # must stop well before max_epochs: 1 improving epoch + 1 patience
    assert len(trainer.history) <= 3


def test_test_mode_reload_runs_test_ensemble(tmp_path):
    cfg = get_config("synthetic_interpolation", TINY + [f"registry_dir={tmp_path}"])
    trainer, best = run_experiment(cfg)
    import os

    run_id = os.path.basename(trainer.ckpt.run_dir)
    metrics = reload_and_test(str(tmp_path), run_id)
    assert "test/crps" in metrics and np.isfinite(metrics["test/crps"])
    # test-end auto-persists per-horizon metric curves
    # (ref forecasting_multi_horizon.py:262-279)
    import glob
    import json

    curves = glob.glob(os.path.join(trainer.ckpt.run_dir, "curves", "test_*.json"))
    assert curves, "expected per-horizon curve tables after mode=test"
    table = json.load(open(curves[0]))
    assert "horizon" in table and len(table["horizon"]) >= 1


def test_cli_test_mode(tmp_path):
    cfg = get_config("synthetic_interpolation", TINY + [f"registry_dir={tmp_path}"])
    trainer, _ = run_experiment(cfg)
    import os

    run_id = os.path.basename(trainer.ckpt.run_dir)
    score = cli_main(["mode=test", f"run_id={run_id}", f"registry_dir={tmp_path}"])
    assert np.isfinite(score)


def test_watch_gradients_per_module_norms(tmp_path):
    """trainer.watch_gradients=true adds per-top-level-module gradient norms
    (the local analogue of W&B WatchModel, ref wandb_callbacks.py:22-42)."""
    import jax
    import jax.numpy as jnp

    from dyffusion_tpu.interface import build_experiment, create_train_state, get_datamodule
    from dyffusion_tpu.training.trainer import make_train_step

    cfg = get_config(
        "synthetic_interpolation", TINY + [f"registry_dir={tmp_path}", "trainer.save_checkpoints=False"]
    )
    dm = get_datamodule(cfg)
    dm.setup()
    exp, model, variables, loss_fn, eval_fns, _ = build_experiment(cfg, dm)
    state = create_train_state(cfg, variables)
    step = make_train_step(loss_fn, watch_gradients=True)
    batch = {k: jnp.asarray(v) for k, v in next(iter(dm.train_batches())).items()}
    _, metrics = step(state, batch)
    grad_keys = [k for k in metrics if k.startswith("grads/")]
    assert "grads/init_conv/norm" in grad_keys
    assert any("final_res_block" in k for k in grad_keys)
    for k in grad_keys:
        if k.endswith("/hist"):  # fixed-bin histograms (round 3)
            assert np.all(np.isfinite(np.asarray(metrics[k])))
        else:
            assert np.isfinite(float(metrics[k]))


def test_balanced_eval_batching_minimizes_padding():
    """Eval splits batch with balanced sizes: same batch COUNT as
    eval_batch_size, but sizes differing by at most one row, so the padded
    compile shape wastes at most one row per batch (padded rows burn
    sampler compute without metric credit)."""
    from dyffusion_tpu.data.base import DataModule, DatasetSplit

    dm = DataModule(batch_size=8, eval_batch_size=4)
    for n, expected_sizes in [
        (5, [3, 2]),       # naive 4+1 would pad 3 rows; balanced pads 1
        (8, [4, 4]),
        (9, [3, 3, 3]),    # naive 4+4+1 pads 3; balanced pads 0
        (3, [3]),          # under one batch: single full batch
        (12, [4, 4, 4]),
    ]:
        dm._splits = {"val": DatasetSplit({"x": np.arange(n, dtype=np.float32)[:, None]})}
        batches = list(dm.val_batches())
        sizes = [b["x"].shape[0] for b in batches]
        assert sizes == expected_sizes, (n, sizes)
        # same number of batches as plain eval_batch_size chunking
        assert len(sizes) == -(-n // 4)
        # all rows exactly once, in order
        np.testing.assert_array_equal(
            np.concatenate([b["x"][:, 0] for b in batches]), np.arange(n, dtype=np.float32))
