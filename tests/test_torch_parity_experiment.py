"""Experiment-layer (Lightning-loop) golden parity vs the literal reference.

Instantiates the reference's actual ``InterpolationExperiment``
(``src/experiment_types/interpolation.py`` on top of the 700-LoC
``BaseExperiment``) with a real weight-ported torch ``Unet`` — via a duck
``hydra.utils.instantiate`` — and compares its END-TO-END ``get_loss``
(random-time draw -> window/last-frame input assembly -> target indexing ->
model forward -> criterion) against OUR ``InterpolationExperiment``'s real
``make_loss_fn`` on the same batch, same ported weights, and the same
random time draws (the reference replays our jax randint through a patched
``torch.randint``). Also pins the evaluation input assembly.
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests._reference_import import import_reference
from tests.test_torch_parity import _port_unet_weights

B, HGT, WID = 3, 10, 10
C, SC = 4, 1  # spring-mesh dims (get_dims_of_dataset: 4 channels + 1 cond)
WINDOW, HORIZON = 1, 4


class _Cfg(dict):
    """dict + attribute access (what DictConfig offers and the reference's
    ``get_dims_of_dataset`` / hparams paths touch)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


def _install_hydra_stub():
    """hydra.utils.instantiate resolving ``_target_`` by import — just what
    ``BaseExperiment.instantiate_model`` needs."""
    import importlib

    def instantiate(config, *args, **kwargs):
        cfg = dict(config)
        target = cfg.pop("_target_")
        kwargs.pop("_recursive_", None)
        mod, cls = target.rsplit(".", 1)
        cls = getattr(importlib.import_module(mod), cls)
        return cls(**{**cfg, **kwargs})

    if "hydra" not in sys.modules or not hasattr(sys.modules["hydra"], "utils"):
        hydra = types.ModuleType("hydra")
        hydra.utils = types.ModuleType("hydra.utils")
        sys.modules["hydra"] = hydra
        sys.modules["hydra.utils"] = hydra.utils
    sys.modules["hydra"].utils.instantiate = instantiate
    sys.modules["hydra.utils"].instantiate = instantiate


@pytest.fixture(scope="module")
def setup():
    _install_hydra_stub()
    ref_mod = import_reference("src.experiment_types.interpolation")

    model_config = _Cfg(
        _target_="src.models.unet.Unet",
        dim=8, dim_mults=[1, 2], resnet_block_groups=4, with_time_emb=True,
    )
    datamodule_config = _Cfg(
        _target_="src.datamodules.physical_systems_benchmark.PhysicalSystemsBenchmarkDataModule",
        physical_system="spring-mesh", window=WINDOW, horizon=HORIZON,
    )
    ref_exp = ref_mod.InterpolationExperiment(
        model_config=model_config, datamodule_config=datamodule_config,
        diffusion_config=None, monitor=None, num_predictions=1, verbose=False,
    )
    ref_exp.eval()  # dropout off; p=0 anyway
    assert ref_exp.window == WINDOW and ref_exp.horizon == HORIZON
    # channel arithmetic (ref interpolation.py:48-51): window*C + C inputs
    assert ref_exp.model.hparams["num_input_channels"] == WINDOW * C + C
    assert ref_exp.model.hparams["num_conditional_channels"] == SC

    from dyffusion_tpu.experiments.base import ExperimentConfig
    from dyffusion_tpu.experiments.interpolation import InterpolationExperiment
    from dyffusion_tpu.models import Unet, make_train_apply_fn

    dims = {"input": C, "output": C, "spatial": (HGT, WID), "conditional": SC}
    cfg = ExperimentConfig(window=WINDOW, horizon=HORIZON, num_predictions=1,
                           loss_function="mse")
    ours = InterpolationExperiment(cfg, dims)
    our_model = Unet(
        dim=8, dim_mults=(1, 2), resnet_block_groups=4, with_time_emb=True,
        num_input_channels=WINDOW * C + C, num_output_channels=C,
        num_conditional_channels=SC,
    )
    variables = {"params": _port_unet_weights(ref_exp.model, n_levels=2)}
    loss_fn = ours.make_loss_fn(make_train_apply_fn(our_model, has_batch_stats=False))

    rng = np.random.default_rng(29)
    dynamics = rng.normal(size=(B, WINDOW + HORIZON, HGT, WID, C)).astype(np.float32)
    condition = rng.normal(size=(B, HGT, WID, SC)).astype(np.float32)
    return ref_exp, ours, loss_fn, variables, dynamics, condition


def _nchw(x):
    return torch.from_numpy(np.moveaxis(np.asarray(x), -1, 1))


def test_get_loss_matches_literal_reference(setup):
    """The full training objective: random i ~ U{1..h-1} per row, inputs =
    [window frames, last frame], target = dynamics[:, w+i-1], MSE — our real
    ``make_loss_fn`` vs the reference's real ``get_loss`` (ref
    interpolation.py:149-167) with the SAME time draws and weights."""
    ref_exp, ours, loss_fn, variables, dynamics, condition = setup

    key = jax.random.key(31)
    # replicate the loss_fn's internal draw to feed the reference
    k_t, _ = jax.random.split(key)
    t_ours = np.asarray(jax.random.randint(k_t, (B,), 1, HORIZON))

    loss, _aux = loss_fn(
        variables,
        {"dynamics": jnp.asarray(dynamics), "condition": jnp.asarray(condition)},
        key,
    )

    # ref: possible_times[randint(len, (b,))] with possible_times = [1..h-1]
    batch = {
        "dynamics": torch.from_numpy(np.moveaxis(dynamics, -1, 2)),  # (B,T,C,H,W)
        "condition": _nchw(condition),
    }
    orig_randint = torch.randint
    torch.randint = lambda *a, **kw: torch.from_numpy((t_ours - 1).astype(np.int64))
    try:
        with torch.no_grad():
            ref_loss = ref_exp.get_loss(batch)
    finally:
        torch.randint = orig_randint

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-4)


def test_eval_input_assembly_matches_literal_reference(setup):
    """``get_inputs_from_dynamics``/``get_evaluation_inputs`` (ref
    interpolation.py:129-146) vs our ``get_inputs``."""
    ref_exp, ours, _loss_fn, _vars, dynamics, _cond = setup
    with torch.no_grad():
        ref_in = ref_exp.get_evaluation_inputs(
            torch.from_numpy(np.moveaxis(dynamics, -1, 2)), split="val").numpy()
    ours_in = np.moveaxis(np.asarray(ours.get_inputs(jnp.asarray(dynamics))), -1, 1)
    np.testing.assert_allclose(ours_in, ref_in, rtol=1e-6)


def test_monitor_and_horizon_range_match_reference(setup):
    ref_exp, ours, *_ = setup
    assert list(ref_exp.horizon_range) == list(range(1, HORIZON))
    # CRPS monitor auto-selection semantics (ref config_utils.py:188-195)
    assert ours.default_monitor == "val/avg/mse"  # num_predictions == 1 here


@pytest.fixture(scope="module")
def fc_setup():
    """The two non-diffusion forecasting baselines (ref
    ``forecasting_multi_horizon.py:427-499``) with weight-ported backbones."""
    _install_hydra_stub()
    fmh = import_reference("src.experiment_types.forecasting_multi_horizon")

    datamodule_config = _Cfg(
        _target_="src.datamodules.physical_systems_benchmark.PhysicalSystemsBenchmarkDataModule",
        physical_system="spring-mesh", window=WINDOW, horizon=HORIZON,
    )

    def build(ref_cls, with_time_emb, out_mult):
        model_config = _Cfg(
            _target_="src.models.unet.Unet",
            dim=8, dim_mults=[1, 2], resnet_block_groups=4,
            with_time_emb=with_time_emb,
        )
        exp = ref_cls(
            model_config=model_config, datamodule_config=datamodule_config,
            diffusion_config=None, monitor=None, num_predictions=1, verbose=False,
        )
        exp.eval()
        assert exp.model.hparams["num_output_channels"] == C * out_mult
        return exp

    ref_sim = build(fmh.SimultaneousMultiHorizonForecasting, False, HORIZON)
    ref_tc = build(fmh.MultiHorizonForecastingTimeConditioned, True, 1)

    rng = np.random.default_rng(37)
    dynamics = rng.normal(size=(B, WINDOW + HORIZON, HGT, WID, C)).astype(np.float32)
    condition = rng.normal(size=(B, HGT, WID, SC)).astype(np.float32)
    return ref_sim, ref_tc, dynamics, condition


def _our_fc(kind, ref_model, with_time_emb, out_mult):
    from dyffusion_tpu.experiments.base import ExperimentConfig
    from dyffusion_tpu.experiments.forecasting import (
        SimultaneousForecastingExperiment,
        TimeConditionedForecastingExperiment,
    )
    from dyffusion_tpu.models import Unet, make_train_apply_fn

    dims = {"input": C, "output": C, "spatial": (HGT, WID), "conditional": SC}
    cfg = ExperimentConfig(window=WINDOW, horizon=HORIZON, num_predictions=1,
                           loss_function="mse")
    cls = (SimultaneousForecastingExperiment if kind == "sim"
           else TimeConditionedForecastingExperiment)
    try:
        exp = cls(cfg, dims)
    except TypeError:
        exp = cls(cfg, dims, is_diffusion=False)
    model = Unet(
        dim=8, dim_mults=(1, 2), resnet_block_groups=4,
        with_time_emb=with_time_emb,
        num_input_channels=WINDOW * C, num_output_channels=C * out_mult,
        num_conditional_channels=SC,
    )
    variables = {"params": _port_unet_weights(ref_model, n_levels=2)}
    return exp, exp.make_loss_fn(make_train_apply_fn(model, has_batch_stats=False)), variables


def test_simultaneous_get_loss_matches_literal_reference(fc_setup):
    """Predict all h steps at once: targets = frames w..w+h-1 channel-folded
    t-major (ref :475-483) — fully deterministic, same weights both sides."""
    ref_sim, _ref_tc, dynamics, condition = fc_setup
    exp, loss_fn, variables = _our_fc("sim", ref_sim.model, False, HORIZON)

    loss, _ = loss_fn(
        variables,
        {"dynamics": jnp.asarray(dynamics), "condition": jnp.asarray(condition)},
        jax.random.key(41),
    )
    batch = {
        "dynamics": torch.from_numpy(np.moveaxis(dynamics, -1, 2)),
        "condition": _nchw(condition),
    }
    with torch.no_grad():
        ref_loss = ref_sim.get_loss(batch)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-4)


def test_time_conditioned_get_loss_matches_literal_reference(fc_setup):
    """Random t ~ U{1..h} per row conditions the backbone; target =
    dynamics[:, w+t-1] (ref :435-451) — the reference replays our draws."""
    _ref_sim, ref_tc, dynamics, condition = fc_setup
    exp, loss_fn, variables = _our_fc("tc", ref_tc.model, True, 1)

    key = jax.random.key(43)
    k_t, _ = jax.random.split(key)
    t_ours = np.asarray(jax.random.randint(k_t, (B,), 1, HORIZON + 1))

    loss, _ = loss_fn(
        variables,
        {"dynamics": jnp.asarray(dynamics), "condition": jnp.asarray(condition)},
        key,
    )
    batch = {
        "dynamics": torch.from_numpy(np.moveaxis(dynamics, -1, 2)),
        "condition": _nchw(condition),
    }
    orig_randint = torch.randint
    torch.randint = lambda *a, **kw: torch.from_numpy(t_ours.astype(np.int64))
    try:
        with torch.no_grad():
            ref_loss = ref_tc.get_loss(batch)
    finally:
        torch.randint = orig_randint
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-4)
