"""Spring-mesh DYffusion stage-2 through the real loader: exercises the
BatchNorm forecaster train-apply inside the engine (cnn_simple backbone) and
boundary-condition application in stage-2 eval."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dyffusion_tpu.config import get_config
from dyffusion_tpu.data.physical_systems import write_fake_benchmark_dir
from dyffusion_tpu.interface import build_experiment, create_train_state, get_datamodule
from dyffusion_tpu.models import BackboneSpec, SimpleConvNet, init_backbone, make_apply_fn
from dyffusion_tpu.training.trainer import make_train_step


@pytest.fixture(scope="module")
def spring_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bench"))
    write_fake_benchmark_dir(root, "spring-mesh", n_time=16)
    return root


def test_stage2_with_batchnorm_forecaster(spring_root):
    cfg = get_config(
        "spring_mesh_dyffusion",
        [
            f"datamodule.data_dir={spring_root}",
            "datamodule.horizon=4",
            "datamodule.prediction_horizon=8",
            "datamodule.batch_size=4",
            "model.dim=16",
            "module.num_predictions=2",
            "module.num_predictions_test=2",
            "trainer.save_checkpoints=False",
        ],
    )
    dm = get_datamodule(cfg)
    dm.setup()

    # in-memory interpolator (cnn_simple too): inputs = [x0, x_last] = 2*C,
    # static condition = 1ch mask
    ip_spec = BackboneSpec(8, 4, 1, (10, 10), with_time_emb=True)
    ip_model = SimpleConvNet(
        dim=16, num_input_channels=8, num_output_channels=4,
        num_conditional_channels=1, with_time_emb=True, dropout=0.1,
    )
    ip_vars = init_backbone(ip_model, ip_spec, jax.random.key(0))
    interpolator = (make_apply_fn(ip_model), ip_vars)

    exp, model, variables, loss_fn, eval_fns, engine = build_experiment(
        cfg, dm, interpolator=interpolator
    )
    assert "batch_stats" in variables  # cnn_simple default batch_norm
    assert engine.forecaster_train_apply is not None

    state = create_train_state(cfg, variables)
    step = make_train_step(loss_fn)
    batch = {k: jnp.asarray(v) for k, v in next(iter(dm.train_batches())).items()}
    bs_before = jax.tree_util.tree_leaves(state.model_state["batch_stats"])[0].copy()
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss_forward2"]) >= 0  # λ2=0.5 default active
    bs_after = jax.tree_util.tree_leaves(state.model_state["batch_stats"])[0]
    # forecaster BN stats updated through the engine's train apply
    assert not np.allclose(np.asarray(bs_before), np.asarray(bs_after))

    # stage-2 eval: sampler + boundary conditions; pinned q-nodes must equal
    # the base positions in every prediction
    out = jax.jit(eval_fns["val"])(state.eval_variables(), batch, jax.random.key(1))
    preds = np.asarray(out["t2_preds"])  # (N, B, H, W, C)
    fixed = np.asarray(batch["metadata_fixed_mask"])
    base_q = np.asarray(batch["metadata_base_q"])
    for b in range(preds.shape[1]):
        fq = fixed[b][..., 2:]
        np.testing.assert_allclose(preds[0, b][..., 2:][fq], base_q[b][fq], rtol=1e-5)
        fp = fixed[b][..., :2]
        assert np.all(preds[0, b][..., :2][fp] == 0.0)


def test_forward_conditioning_none_channel_arithmetic():
    """Regression: with forward_conditioning='none' the forecaster must be
    built WITHOUT the window-data conditioning channels (ref
    navier_stokes_dyffusion.yaml:16 + predict_x_last :205-239) — the channel
    spec must know the mode before the engine exists."""
    import jax
    import jax.numpy as jnp

    from dyffusion_tpu.config import get_config
    from dyffusion_tpu.interface import build_experiment, get_datamodule
    from dyffusion_tpu.models import make_apply_fn

    OV = [
        "datamodule.n_traj=4", "datamodule.n_time=12", "datamodule.spatial=(8,8)",
        "datamodule.channels=3", "datamodule.conditional_channels=2",
        "datamodule.horizon=4", "datamodule.batch_size=4", "datamodule.eval_batch_size=4",
        "model.dim=8", "model.dim_mults=(1,)",
        "module.num_predictions=2", "diffusion.forward_conditioning=none",
        "trainer.save_checkpoints=False",
    ]
    cfg1 = get_config("synthetic_interpolation", OV)
    dm = get_datamodule(cfg1)
    dm.setup()
    _, ip_model, ip_vars, _, _, _ = build_experiment(cfg1, dm)
    cfg = get_config("synthetic_dyffusion", OV)
    exp, model, variables, loss_fn, eval_fns, engine = build_experiment(
        cfg, dm, interpolator=(make_apply_fn(ip_model), ip_vars)
    )
    # statics only: no window-data channels on the forecaster
    assert exp.num_conditional_channels() == 2
    batch = {k: jnp.asarray(v) for k, v in next(iter(dm.val_batches())).items()}
    loss, _ = loss_fn(variables, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
    out = jax.jit(eval_fns["val"])(variables, batch, jax.random.key(0))
    assert out["t1_preds"].shape == (2, 4, 8, 8, 3)
    assert bool(jnp.all(jnp.isfinite(out["t4_preds"])))
