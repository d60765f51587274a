"""GaussianDiffusion ENGINE golden parity vs the literal torch reference.

Extends the golden set beyond buffer comparison (tests/test_torch_parity.py)
to the full engine: ``p_losses`` and the complete ancestral + DDIM sampling
loops (ref ``src/diffusion/denoising_diffusion.py:151-337``) run END-TO-END
against the reference implementation with the SAME ported weights and the
SAME noise sequence — the reference's ``torch.randn``/``torch.randn_like``
draws are replayed from the exact noise arrays our scan-based samplers
consume, so every trajectory is deterministic and must agree to f32
tolerance.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests._reference_import import import_reference
from tests.test_torch_parity import _port_unet_weights

B, C, SC, HGT, WID = 2, 2, 1, 8, 8
T = 6  # diffusion timesteps


class _NoiseQueue:
    """Replays a fixed sequence of arrays through torch.randn/randn_like."""

    def __init__(self, arrays_nchw):
        self.q = [torch.from_numpy(np.ascontiguousarray(a)) for a in arrays_nchw]

    def randn(self, *shape, **kw):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list, torch.Size)):
            shape = tuple(shape[0])
        a = self.q.pop(0)
        assert tuple(a.shape) == tuple(shape), (a.shape, shape)
        return a

    def randn_like(self, x):
        a = self.q.pop(0)
        assert a.shape == x.shape, (a.shape, x.shape)
        return a


def _nchw(x_jax_nhwc):
    return np.transpose(np.asarray(x_jax_nhwc), (0, 3, 1, 2))


def _nhwc(x_np_nchw):
    return jnp.asarray(np.transpose(x_np_nchw, (0, 2, 3, 1)))


def _build_pair(objective, beta_schedule, sampling_timesteps=None, eta=1.0,
                clip_denoised=False, hardcode_betaN=False):
    """(ref_engine, our_engine, our_variables) with ported weights."""
    ref_unet_mod = import_reference("src.models.unet")
    ref_dd = import_reference("src.diffusion.denoising_diffusion")

    torch.manual_seed(3)
    ref_net = ref_unet_mod.Unet(
        dim=8, dim_mults=(1, 2), resnet_block_groups=4, with_time_emb=True,
        num_input_channels=C, num_output_channels=C,
        num_conditional_channels=SC, spatial_shape=(HGT, WID),
    )
    ref_net.eval()
    ref_engine = ref_dd.GaussianDiffusion(
        model=ref_net, timesteps=T, sampling_timesteps=sampling_timesteps,
        objective=objective, beta_schedule=beta_schedule,
        ddim_sampling_eta=eta, hardcode_betaN=hardcode_betaN, log_every_t=None,
    )
    ref_engine.eval()

    from dyffusion_tpu.diffusion.ddpm import GaussianDiffusionConfig, GaussianDiffusionEngine
    from dyffusion_tpu.models import Unet, make_apply_fn

    ours_net = Unet(dim=8, dim_mults=(1, 2), resnet_block_groups=4, with_time_emb=True,
                    num_input_channels=C, num_output_channels=C, num_conditional_channels=SC)
    variables = {"params": _port_unet_weights(ref_net, n_levels=2)}
    engine = GaussianDiffusionEngine(
        GaussianDiffusionConfig(
            timesteps=T, sampling_timesteps=sampling_timesteps, objective=objective,
            beta_schedule=beta_schedule, ddim_sampling_eta=eta,
            clip_denoised=clip_denoised, hardcode_betaN=hardcode_betaN,
        ),
        denoiser_apply=make_apply_fn(ours_net), sample_shape=(HGT, WID, C),
    )
    return ref_engine, engine, variables


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(11)
    x_start = rng.normal(size=(B, C, HGT, WID)).astype(np.float32)
    cond = rng.normal(size=(B, SC, HGT, WID)).astype(np.float32)
    return x_start, cond


@pytest.mark.parametrize("objective", ["pred_noise", "pred_x0"])
def test_p_losses_parity(objective, data):
    """Denoising loss at fixed per-row t with the same q_sample noise
    (ref ``p_losses :300-337``, explicit ``noise=`` arg)."""
    x_start, cond = data
    ref_engine, engine, variables = _build_pair(objective, "cosine")

    key = jax.random.key(5)
    k_noise, _ = jax.random.split(key)
    noise = jax.random.normal(k_noise, (B, HGT, WID, C))  # what engine.p_losses draws
    t = np.array([0, T - 1], np.int64)

    with torch.no_grad():
        ref_loss = ref_engine.p_losses(
            torch.from_numpy(x_start), torch.from_numpy(cond),
            t=torch.from_numpy(t), noise=torch.from_numpy(_nchw(noise)),
        )
    loss, _ = engine.p_losses(variables, key, _nhwc(x_start), _nhwc(cond), jnp.asarray(t))
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-4)


@pytest.mark.parametrize("hardcode_betaN", [False, True])
def test_ancestral_sampler_parity(hardcode_betaN, data):
    """Full T-step ancestral p_sample_loop (ref ``:194-236``) with the
    reference replaying OUR scan's noise draws."""
    _, cond = data
    ref_engine, engine, variables = _build_pair(
        "pred_noise", "cosine", hardcode_betaN=hardcode_betaN)

    key = jax.random.key(7)
    shape = (B, HGT, WID, C)
    k_init, k_loop = jax.random.split(key)
    img0 = jax.random.normal(k_init, shape)
    noises = {t: jax.random.normal(jax.random.fold_in(k_loop, t), shape) for t in range(1, T)}
    queue = _NoiseQueue([_nchw(img0)] + [_nchw(noises[t]) for t in range(T - 1, 0, -1)])

    orig_randn, orig_like = torch.randn, torch.randn_like
    torch.randn, torch.randn_like = queue.randn, queue.randn_like
    try:
        with torch.no_grad():
            # log_every_t passed explicitly: the stubbed save_hyperparameters
            # doesn't capture subclass-frame args (the logging block is dead
            # code behind `if False` anyway, ref :223-233)
            ref_out = ref_engine.p_sample_loop(
                torch.from_numpy(cond), (B, C, HGT, WID), log_every_t=10**9)["preds"].numpy()
    finally:
        torch.randn, torch.randn_like = orig_randn, orig_like
    assert not queue.q  # every injected draw consumed

    ours = _nchw(engine.p_sample_loop(variables, key, _nhwc(cond)))
    np.testing.assert_allclose(ours, ref_out, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("objective,eta", [("pred_noise", 1.0), ("pred_x0", 0.0)])
def test_ddim_sampler_parity(objective, eta, data):
    """Subsampled DDIM loop (ref ``ddim_sample :238-279``), S=3 < T=6, with
    matched initial + per-step noise."""
    _, cond = data
    S = 3
    ref_engine, engine, variables = _build_pair(
        objective, "cosine", sampling_timesteps=S, eta=eta)
    assert ref_engine.is_ddim_sampling and engine.is_ddim_sampling

    key = jax.random.key(9)
    shape = (B, HGT, WID, C)
    k_init, k_loop = jax.random.split(key)
    img0 = jax.random.normal(k_init, shape)
    # pairs: [(5,3),(3,1),(1,-1)] — last pair short-circuits before randn_like
    noises = [jax.random.normal(jax.random.fold_in(k_loop, i), shape) for i in range(S - 1)]
    queue = _NoiseQueue([_nchw(img0)] + [_nchw(n) for n in noises])

    orig_randn, orig_like = torch.randn, torch.randn_like
    torch.randn, torch.randn_like = queue.randn, queue.randn_like
    try:
        with torch.no_grad():
            ref_out = ref_engine.ddim_sample(
                torch.from_numpy(cond), (B, C, HGT, WID), verbose=False).numpy()
    finally:
        torch.randn, torch.randn_like = orig_randn, orig_like
    assert not queue.q

    ours = _nchw(engine.ddim_sample(variables, key, _nhwc(cond)))
    np.testing.assert_allclose(ours, ref_out, rtol=2e-3, atol=2e-4)
