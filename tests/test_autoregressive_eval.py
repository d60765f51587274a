"""Autoregressive rollout eval: chained sampler windows reach the full
prediction horizon (ref _evaluation_step :114-229, 4 AR windows for NS)."""
import jax
import jax.numpy as jnp
import numpy as np

from dyffusion_tpu.config import get_config
from dyffusion_tpu.interface import build_experiment, get_datamodule


def test_time_conditioned_ar_rollout_covers_prediction_horizon():
    cfg = get_config(
        "synthetic_time_conditioned",
        [
            "datamodule.n_traj=5",
            "datamodule.n_time=20",
            "datamodule.spatial=(8,8)",
            "datamodule.channels=1",
            "datamodule.horizon=3",
            "datamodule.prediction_horizon=6",
            "datamodule.batch_size=4",
            "model.dim=8",
            "model.dim_mults=(1,)",
            "model.block_dropout=0.3",  # MC-dropout is the member diversity source
            "module.num_predictions=2",
            "module.num_predictions_test=2",
            "trainer.save_checkpoints=False",
        ],
    )
    dm = get_datamodule(cfg)
    dm.setup()
    exp, model, variables, loss_fn, eval_fns, _ = build_experiment(cfg, dm)
    assert exp.num_autoregressive_steps == 1  # ceil(6/3) - 1
    batch = {k: jnp.asarray(v) for k, v in dm.split("test").tensors.items()}
    batch = {k: v[:2] for k, v in batch.items()}
    assert batch["dynamics"].shape[1] == 1 + 6  # window + prediction_horizon
    out = jax.jit(eval_fns["test"])(variables, batch, jax.random.key(0))
    # windows chain: t1..t3 (window 1) then t4..t6 (window 2)
    for i in range(1, 7):
        assert f"t{i}_preds" in out, i
        assert f"t{i}_targets" in out, i
        assert out[f"t{i}_preds"].shape == (2, 2, 8, 8, 1)
        assert bool(jnp.all(jnp.isfinite(out[f"t{i}_preds"])))
    # second-window inputs came from first-window predictions: preds at t4
    # differ across members (stochastic continuation)
    assert not np.allclose(np.asarray(out["t4_preds"][0]), np.asarray(out["t4_preds"][1]))
