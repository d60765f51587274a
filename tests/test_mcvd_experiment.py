"""MCVD + NCSNpp wired through the experiment layer (preset -> loss + sampling)."""
import jax
import jax.numpy as jnp
import numpy as np

from dyffusion_tpu.config import get_config
from dyffusion_tpu.interface import build_experiment, get_datamodule


def test_synthetic_mcvd_preset_end_to_end():
    cfg = get_config(
        "synthetic_mcvd",
        [
            "datamodule.n_traj=4",
            "datamodule.n_time=14",
            "datamodule.spatial=(8,8)",
            "datamodule.channels=1",
            "datamodule.horizon=3",
            "datamodule.batch_size=4",
            "model.name=ncsnpp",
            "model.dim=8",
            "model.dim_mults=(1,2)",
            "model.num_res_blocks=1",
            "model.attn_resolutions=(4,)",
            "model.n_head_channels=8",
            "diffusion.timesteps=10",
            "diffusion.sampling_timesteps=4",
            "module.num_predictions=2",
            "trainer.save_checkpoints=False",
        ],
    )
    dm = get_datamodule(cfg)
    dm.setup()
    exp, model, variables, loss_fn, eval_fns, engine = build_experiment(cfg, dm)
    assert engine is not None and engine.cfg.version == "DDPM"
    # denoiser input channels = h * C; condition channels = window * C
    assert exp.actual_num_input_channels() == 3
    batch = {k: jnp.asarray(v) for k, v in next(iter(dm.train_batches())).items()}
    loss, (metrics, updates) = loss_fn(variables, batch, jax.random.key(0))
    assert np.isfinite(float(loss))
    out = jax.jit(eval_fns["val"])(variables, batch, jax.random.key(1))
    assert out["t1_preds"].shape == (2, 4, 8, 8, 1)
    assert out["t3_preds"].shape == (2, 4, 8, 8, 1)
    assert bool(jnp.all(jnp.isfinite(out["t2_preds"])))
