"""Mixed-precision training lever: bf16 frozen-interpolator forwards inside
``p_losses`` (VERDICT r2 next #1 / weak #7).

The frozen interpolator is the no-grad half of the stage-2 training compute
(ref ``dyffusion.py:496-567``: two interpolator + two forecaster forwards per
step); running it in bf16 must leave the loss and the forecaster gradients
within mixed-precision tolerance of the f32 path — the train-side analogue of
``test_bf16_sampling_parity.py``.
"""
import jax
import jax.numpy as jnp
import numpy as np

from dyffusion_tpu.config import get_config
from dyffusion_tpu.interface import build_experiment, create_train_state, get_datamodule
from dyffusion_tpu.models import make_apply_fn

TINY = [
    "datamodule.n_traj=4",
    "datamodule.n_time=14",
    "datamodule.spatial=(8,8)",
    "datamodule.channels=1",
    "datamodule.horizon=4",
    "datamodule.batch_size=8",
    "model.dim=8",
    "model.dim_mults=(1,)",
    "model.block_dropout=0.2",
    "module.num_predictions=2",
    "trainer.save_checkpoints=False",
    "diffusion.lambda_reconstruction=0.5",
    "diffusion.lambda_reconstruction2=0.5",  # exercise the grad-carrying q_sample
]


def _loss_and_grads(extra, wrap=None):
    cfg1 = get_config("synthetic_interpolation", TINY)
    dm = get_datamodule(cfg1)
    dm.setup()
    _, ip_model, ip_vars, _, _, _ = build_experiment(cfg1, dm)
    ip_apply = make_apply_fn(ip_model)

    cfg = get_config("synthetic_dyffusion", TINY + extra)
    exp, model, variables, loss_fn, _, engine = build_experiment(
        cfg, dm, interpolator=(ip_apply, ip_vars)
    )
    if wrap is not None:
        loss_fn = wrap(loss_fn)
    state = create_train_state(cfg, variables)
    batch = {
        k: jnp.asarray(v)
        for k, v in next(iter(dm.train_batches(rng=np.random.default_rng(0)))).items()
    }
    rng = jax.random.key(11)

    def wrapped(params):
        loss, (aux, _) = loss_fn({"params": params}, batch, rng)
        return loss

    loss, grads = jax.jit(jax.value_and_grad(wrapped))(state.params)
    return float(loss), grads, engine


def test_bf16_interpolator_train_parity():
    loss32, g32, eng32 = _loss_and_grads([])
    loss16, g16, eng16 = _loss_and_grads(["diffusion.train_interpolator_dtype=bfloat16"])
    assert eng32.cfg.train_interpolator_dtype is None
    assert eng16.cfg.train_interpolator_dtype == "bfloat16"

    # identical rng draws both sides -> only precision differs
    assert np.isfinite(loss16)
    np.testing.assert_allclose(loss16, loss32, rtol=0.05)

    f32 = np.concatenate([np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(g32)])
    f16 = np.concatenate([np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(g16)])
    assert np.all(np.isfinite(f16))
    cos = float(np.dot(f32, f16) / (np.linalg.norm(f32) * np.linalg.norm(f16) + 1e-30))
    assert cos > 0.98, f"gradient direction drifted: cos={cos}"
    # norms in the same ballpark
    ratio = np.linalg.norm(f16) / (np.linalg.norm(f32) + 1e-30)
    assert 0.8 < ratio < 1.25, f"gradient norm ratio {ratio}"


def test_full_bf16_mixed_precision_train_parity():
    """module.train_dtype=bfloat16: the WHOLE stage-2 forward/backward in
    bf16 (trainable forecaster included) with f32 master params and f32
    gradients through the cast's vjp. Gradient direction must survive."""
    from dyffusion_tpu.training.trainer import mixed_precision_loss

    loss32, g32, _ = _loss_and_grads([])
    loss16, g16, _ = _loss_and_grads([], wrap=mixed_precision_loss)

    assert np.isfinite(loss16)
    np.testing.assert_allclose(loss16, loss32, rtol=0.05)
    f32 = np.concatenate([np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(g32)])
    f16 = np.concatenate([np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(g16)])
    # gradients must come back f32 (master precision), not bf16
    assert all(np.asarray(x).dtype == np.float32 for x in jax.tree_util.tree_leaves(g16))
    assert np.all(np.isfinite(f16))
    cos = float(np.dot(f32, f16) / (np.linalg.norm(f32) * np.linalg.norm(f16) + 1e-30))
    assert cos > 0.97, f"gradient direction drifted: cos={cos}"
    ratio = np.linalg.norm(f16) / (np.linalg.norm(f32) + 1e-30)
    assert 0.7 < ratio < 1.4, f"gradient norm ratio {ratio}"


def test_train_dtype_wired_through_driver(tmp_path):
    """run_experiment with module.train_dtype=bfloat16 trains end-to-end:
    finite loss/best, f32 master params preserved in the checkpointed state."""
    from dyffusion_tpu.interface import run_experiment

    cfg = get_config(
        "synthetic_interpolation",
        TINY
        + [
            "module.train_dtype=bfloat16",
            "trainer.max_epochs=1",
            f"registry_dir={tmp_path}",
        ],
    )
    trainer, best = run_experiment(cfg)
    assert np.isfinite(best)
    leaves = jax.tree_util.tree_leaves(trainer.state.params)
    assert all(x.dtype == jnp.float32 for x in leaves)


def test_trainer_precision_alias_and_matmul_precision(tmp_path):
    """trainer.precision=16 (ref configs/trainer/default.yaml:14) aliases
    module.train_dtype=bfloat16; matmul_precision (ref torch_matmul_precision,
    config_utils.py:148-151) sets jax_default_matmul_precision."""
    from dyffusion_tpu.interface import run_experiment

    prev = jax.config.jax_default_matmul_precision
    try:
        cfg = get_config(
            "synthetic_interpolation",
            TINY
            + [
                "trainer.precision=16",
                "matmul_precision=high",
                "trainer.max_epochs=1",
                f"registry_dir={tmp_path}",
            ],
        )
        trainer, best = run_experiment(cfg)
        assert np.isfinite(best)
        # 'high' maps to tensorfloat32 (the TPU backend rejects HIGH at lowering)
        assert jax.config.jax_default_matmul_precision == "tensorfloat32"
        # master params stay f32 under the precision alias
        assert all(
            x.dtype == jnp.float32
            for x in jax.tree_util.tree_leaves(trainer.state.params)
        )
    finally:
        jax.config.update("jax_default_matmul_precision", prev)
