"""DYffusion ENGINE golden parity vs the literal torch reference.

The core contribution (two-term p_losses + schedule mapping + cold sampler +
refinement, ``src/diffusion/dyffusion.py:17-567``) compared END-TO-END against
the reference implementation itself: both sides run the SAME weights (ported
torch->flax), dropout disabled everywhere, so every quantity is deterministic
and must agree to f32 tolerance. This upgrades round 1's transcription-based
engine test to a measured-parity test against the installed reference.
"""
import sys
import types
from contextlib import contextmanager

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests._reference_import import import_reference
from tests.test_torch_parity import _port_unet_weights

# hydra is imported (module-level) by src.interface, which DYffusion pulls in
# for its checkpoint resolution; only the name needs to exist here.
if "hydra" not in sys.modules:
    hydra_stub = types.ModuleType("hydra")
    hydra_stub.utils = types.ModuleType("hydra.utils")
    sys.modules["hydra"] = hydra_stub
    sys.modules["hydra.utils"] = hydra_stub.utils

B, C, SC, HGT, WID = 3, 2, 1, 16, 16
TIMESTEPS = 4  # horizon
K_AUX = 2  # additional interpolation steps -> num diffusion steps = 6


def _make_ref_unet(ref_unet_mod, in_ch, out_ch, cond_ch, seed):
    torch.manual_seed(seed)
    m = ref_unet_mod.Unet(
        dim=8, dim_mults=(1, 2), resnet_block_groups=4, with_time_emb=True,
        num_input_channels=in_ch, num_output_channels=out_ch,
        num_conditional_channels=cond_ch, spatial_shape=(HGT, WID),
    )
    m.eval()
    return m


class _DuckInterpolator(torch.nn.Module):
    """The minimal interpolator surface DYffusion touches
    (``dyffusion.py:461-494``): window/true_horizon attrs,
    inference_dropout_scope, predict -> {'preds': ...}."""

    def __init__(self, net, window, horizon):
        super().__init__()
        self.model = net
        self.window = window
        self.true_horizon = horizon

    @contextmanager
    def inference_dropout_scope(self, condition=None, **kw):
        yield  # dropout p=0 everywhere; scope is a no-op

    def predict(self, inputs, condition=None, time=None, **kw):
        with torch.no_grad():
            return {"preds": self.model(inputs, time=time, condition=condition)}


@pytest.fixture(scope="module")
def parity_setup():
    ref_unet_mod = import_reference("src.models.unet")
    ref_dyf_mod = import_reference("src.diffusion.dyffusion")

    # forecaster: x (C) + [data cond (C) + static (SC)] channels
    ref_fc = _make_ref_unet(ref_unet_mod, C, C, C + SC, seed=0)
    # interpolator: concat[x0, x_last] (2C) + static (SC)
    ref_ip = _make_ref_unet(ref_unet_mod, 2 * C, C, SC, seed=1)

    ref_engine = ref_dyf_mod.DYffusion(
        model=ref_fc,
        interpolator=_DuckInterpolator(ref_ip, window=1, horizon=TIMESTEPS),
        timesteps=TIMESTEPS,
        forward_conditioning="data",
        schedule="before_t1_only",
        additional_interpolation_steps=K_AUX,
        interpolate_before_t1=True,
        sampling_type="cold",
        time_encoding="dynamics",
        refine_intermediate_predictions=True,
        lambda_reconstruction=0.5,
        lambda_reconstruction2=0.5,
        enable_interpolator_dropout=True,
    )
    ref_engine.eval()

    from dyffusion_tpu.diffusion import DyffusionConfig, DyffusionEngine
    from dyffusion_tpu.models import Unet, make_apply_fn

    ours_fc = Unet(dim=8, dim_mults=(1, 2), resnet_block_groups=4, with_time_emb=True,
                   num_input_channels=C, num_output_channels=C, num_conditional_channels=C + SC)
    ours_ip = Unet(dim=8, dim_mults=(1, 2), resnet_block_groups=4, with_time_emb=True,
                   num_input_channels=2 * C, num_output_channels=C, num_conditional_channels=SC)
    fc_vars = {"params": _port_unet_weights(ref_fc, n_levels=2)}
    ip_vars = {"params": _port_unet_weights(ref_ip, n_levels=2)}

    cfg = DyffusionConfig(
        timesteps=TIMESTEPS,
        forward_conditioning="data",
        schedule="before_t1_only",
        additional_interpolation_steps=K_AUX,
        interpolate_before_t1=True,
        sampling_type="cold",
        time_encoding="dynamics",
        refine_intermediate_predictions=True,
        lambda_reconstruction=0.5,
        lambda_reconstruction2=0.5,
        num_input_channels=C,
    )
    engine = DyffusionEngine(
        cfg, forecaster_apply=make_apply_fn(ours_fc),
        interpolator_apply=make_apply_fn(ours_ip), interpolator_horizon=TIMESTEPS,
    )
    assert engine.num_timesteps == ref_engine.num_timesteps == TIMESTEPS + K_AUX

    rng = np.random.default_rng(0)
    cond = rng.normal(size=(B, C, HGT, WID)).astype(np.float32)
    x_last = rng.normal(size=(B, C, HGT, WID)).astype(np.float32)
    static = rng.normal(size=(B, SC, HGT, WID)).astype(np.float32)
    return ref_engine, engine, fc_vars, ip_vars, cond, x_last, static


def _nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def test_step_mapping_matches_reference(parity_setup):
    ref_engine, engine, *_ = parity_setup
    for d in range(1, engine.num_timesteps):
        np.testing.assert_allclose(
            float(engine.mapping.i_of(d)),
            float(ref_engine.diffusion_step_to_interpolation_step(d)),
            rtol=1e-6, err_msg=f"i(d) mismatch at d={d}",
        )
    assert list(engine.sampling_schedule) == list(ref_engine.sampling_schedule)


def test_p_losses_matches_reference(parity_setup):
    ref_engine, engine, fc_vars, ip_vars, cond, x_last, static = parity_setup
    t_np = np.array([0, 2, 5], np.float32)  # t=0 row, mid row, last row (N-1)
    with torch.no_grad():
        ref_losses = ref_engine.p_losses(
            xt_last=torch.from_numpy(x_last),
            condition=torch.from_numpy(cond),
            t=torch.from_numpy(t_np),
            static_condition=torch.from_numpy(static),
        )
    loss, aux = engine.p_losses(
        fc_vars, ip_vars, jax.random.key(0),
        xt_last=_nhwc(x_last), condition=_nhwc(cond),
        t=jnp.asarray(t_np), static_condition=_nhwc(static),
    )
    np.testing.assert_allclose(float(loss), float(ref_losses["loss"]), rtol=2e-4)
    np.testing.assert_allclose(
        float(aux["loss_forward"]), float(ref_losses["val/loss_forward"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(aux["loss_forward2"]), float(ref_losses["val/loss_forward2"]), rtol=2e-4
    )


def test_cold_sampler_with_refinement_matches_reference(parity_setup):
    ref_engine, engine, fc_vars, ip_vars, cond, x_last, static = parity_setup
    with torch.no_grad():
        ref_out = ref_engine.sample(
            torch.from_numpy(cond), static_condition=torch.from_numpy(static)
        )
    preds = engine.sample(
        fc_vars, ip_vars, jax.random.key(1), _nhwc(cond), _nhwc(static)
    )  # (B, h, H, W, C)
    for i in range(1, TIMESTEPS + 1):
        ours = np.transpose(np.asarray(preds[:, i - 1]), (0, 3, 1, 2))
        theirs = ref_out[f"t{i}_preds"].numpy()
        np.testing.assert_allclose(
            ours, theirs, rtol=2e-3, atol=2e-4,
            err_msg=f"sampled t{i}_preds mismatch vs torch reference",
        )
