"""synthetic_ddpm_v2 preset end-to-end: the LDM-style DDPM engine reachable
from the user-facing driver (VERDICT r1 item #6; ref
``configs/diffusion/denoising_v2.yaml`` -> ``src/diffusion/ddpm.py:28-424``),
including the learnable-logvar leaf threaded into training.
"""
import jax
import jax.numpy as jnp
import numpy as np

from dyffusion_tpu.config import get_config
from dyffusion_tpu.interface import build_experiment, create_train_state, get_datamodule
from dyffusion_tpu.training.trainer import make_train_step

TINY = [
    "datamodule.n_traj=4",
    "datamodule.n_time=14",
    "datamodule.spatial=(8,8)",
    "datamodule.channels=1",
    "datamodule.horizon=3",
    "datamodule.batch_size=4",
    "model.dim=8",
    "model.dim_mults=(1,)",
    "diffusion.timesteps=8",
    "module.num_predictions=2",
    "trainer.save_checkpoints=False",
]


def test_synthetic_ddpm_v2_preset_loss_and_sampling():
    cfg = get_config("synthetic_ddpm_v2", TINY)
    # preset matches ref denoising_v2.yaml defaults
    d = cfg["diffusion"]
    assert d["linear_start"] == 0.0015 and d["linear_end"] == 0.0195
    assert d["parameterization"] == "pred_noise"
    dm = get_datamodule(cfg)
    dm.setup()
    exp, model, variables, loss_fn, eval_fns, engine = build_experiment(cfg, dm)
    from dyffusion_tpu.diffusion.ddpm_latent import LatentDDPMEngine

    assert isinstance(engine, LatentDDPMEngine)
    batch = {k: jnp.asarray(v) for k, v in next(iter(dm.train_batches())).items()}
    loss, (metrics, updates) = loss_fn(variables, batch, jax.random.key(0))
    assert np.isfinite(float(loss))
    assert "loss_simple" in metrics and "loss_vlb" in metrics
    out = jax.jit(eval_fns["val"])(variables, batch, jax.random.key(1))
    assert out["t1_preds"].shape == (2, 4, 8, 8, 1)
    assert bool(jnp.all(jnp.isfinite(out["t3_preds"])))


def test_ddpm_v2_learnable_logvar_is_trained():
    cfg = get_config("synthetic_ddpm_v2", TINY + ["diffusion.learn_logvar=True"])
    dm = get_datamodule(cfg)
    dm.setup()
    exp, model, variables, loss_fn, eval_fns, engine = build_experiment(cfg, dm)
    assert "_diffusion_logvar" in variables["params"]
    assert variables["params"]["_diffusion_logvar"].shape == (8,)

    state = create_train_state(cfg, variables)
    step = make_train_step(loss_fn)
    batch = {k: jnp.asarray(v) for k, v in next(iter(dm.train_batches())).items()}
    lv_before = np.asarray(state.params["_diffusion_logvar"])
    state, metrics = step(state, batch)
    lv_after = np.asarray(state.params["_diffusion_logvar"])
    assert np.isfinite(float(metrics["loss"]))
    # the logvar leaf received gradients and moved
    assert not np.allclose(lv_before, lv_after)
    # eval path strips the logvar leaf before the denoiser apply
    out = jax.jit(eval_fns["val"])(state.eval_variables(), batch, jax.random.key(2))
    assert bool(jnp.all(jnp.isfinite(out["t1_preds"])))


def test_ddpm_v2_log_images():
    cfg = get_config("synthetic_ddpm_v2", TINY)
    dm = get_datamodule(cfg)
    dm.setup()
    exp, model, variables, loss_fn, eval_fns, engine = build_experiment(cfg, dm)
    batch = {k: jnp.asarray(v) for k, v in next(iter(dm.train_batches())).items()}
    from dyffusion_tpu.experiments.base import stack_window

    dynamics = batch["dynamics"]
    cond = stack_window(dynamics, 1)
    # stacked-horizon target layout, as in the simultaneous host
    tgt = jnp.moveaxis(dynamics[:, 1:4], 1, -2).reshape(4, 8, 8, 3)
    logs = engine.log_images(variables, jax.random.key(3), tgt, cond, n_row=2, log_every_t=4)
    assert logs["inputs"].shape == (2, 8, 8, 3)
    assert logs["diffusion_row"].shape[1] == 2
    assert logs["samples"].shape == (2, 8, 8, 3)
    assert logs["denoise_row"].shape[1:] == (2, 8, 8, 3)
    for v in logs.values():
        assert bool(jnp.all(jnp.isfinite(v)))
