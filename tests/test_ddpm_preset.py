"""synthetic_ddpm preset end-to-end: standard-diffusion simultaneous host."""
import jax
import jax.numpy as jnp
import numpy as np

from dyffusion_tpu.config import get_config
from dyffusion_tpu.interface import build_experiment, get_datamodule


def test_synthetic_ddpm_preset_loss_and_sampling():
    cfg = get_config(
        "synthetic_ddpm",
        [
            "datamodule.n_traj=4",
            "datamodule.n_time=14",
            "datamodule.spatial=(8,8)",
            "datamodule.channels=1",
            "datamodule.horizon=3",
            "datamodule.batch_size=4",
            "model.dim=8",
            "model.dim_mults=(1,)",
            "diffusion.timesteps=8",
            "diffusion.sampling_timesteps=4",  # DDIM path
            "module.num_predictions=2",
            "trainer.save_checkpoints=False",
        ],
    )
    dm = get_datamodule(cfg)
    dm.setup()
    exp, model, variables, loss_fn, eval_fns, engine = build_experiment(cfg, dm)
    # denoiser: input = h*C stacked frames, condition = window frames
    assert exp.actual_num_input_channels() == 3
    assert exp.actual_num_output_channels() == 3
    assert engine.is_ddim_sampling
    batch = {k: jnp.asarray(v) for k, v in next(iter(dm.train_batches())).items()}
    loss, (metrics, updates) = loss_fn(variables, batch, jax.random.key(0))
    assert np.isfinite(float(loss))
    out = jax.jit(eval_fns["val"])(variables, batch, jax.random.key(1))
    assert out["t1_preds"].shape == (2, 4, 8, 8, 1)
    assert bool(jnp.all(jnp.isfinite(out["t3_preds"])))
    # diffusion members differ (sampling noise)
    assert not np.allclose(np.asarray(out["t1_preds"][0]), np.asarray(out["t1_preds"][1]))
