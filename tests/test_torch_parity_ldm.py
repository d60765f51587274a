"""LDM-style DDPM ENGINE golden parity vs the literal torch reference.

``DDPM`` (the CompVis latent-diffusion port, ref ``src/diffusion/ddpm.py:28-
337``): register_schedule buffers incl. ``v_posterior`` blending and the
``lvlb_weights`` (both parameterizations, incl. the quirky upstream
``0.5*sqrt(ac)/(2.*1 - ac)`` pred_x0 formula preserved verbatim), the
simple+VLB ``p_losses``, and the full ancestral ``p_sample_loop`` — compared
END-TO-END against the reference with a duck-typed closed-form denoiser
(identical math both sides; backbone parity is covered separately) and the
reference replaying OUR scan's exact noise draws.

Note: the reference's ``p_losses`` registers a (learnable) ``logvar`` but
never applies it in the loss (ref ``:89-92`` vs ``:301-328``) — our engine's
``logvar`` path follows the upstream LDM formula and is therefore compared
here only with ``logvar=None`` (the reference's effective behavior).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests._reference_import import import_reference

B, C, SC, HGT, WID = 2, 3, 2, 6, 6
T = 7


class _DuckDenoiserTorch(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.hparams = {}
        self.spatial_shape = (HGT, WID)
        self.num_input_channels = C
        self.num_output_channels = C
        self.num_conditional_channels = SC

    def forward(self, x, time=None, condition=None):
        temb = torch.sin(0.1 * time.float()).reshape(-1, 1, 1, 1)
        c = condition.mean(dim=1, keepdim=True) if condition is not None else 0.0
        u = 0.7 * x + 0.3 * c + temb
        # rational bounded nonlinearity: pure mul/add/div round identically
        # in torch and XLA (tanh's libm-vs-XLA approximations differ ~3e-5,
        # which the 1/(1-alpha) posterior coefficients amplify across steps)
        return u / (1.0 + 0.25 * u * u) + 0.05 * x


def _duck_denoiser_apply(variables, x, time, condition, rng):
    temb = jnp.sin(0.1 * time.astype(jnp.float32)).reshape(-1, 1, 1, 1)
    c = jnp.mean(condition, axis=1, keepdims=True) if condition is not None else 0.0
    u = 0.7 * x + 0.3 * c + temb
    return u / (1.0 + 0.25 * u * u) + 0.05 * x


class _NoiseQueue:
    def __init__(self, arrays):
        self.q = [torch.from_numpy(np.ascontiguousarray(np.asarray(a))) for a in arrays]

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


def _build_pair(parameterization="pred_noise", v_posterior=0.0,
                original_elbo_weight=0.0, hardcode_betaN=False):
    ref_mod = import_reference("src.diffusion.ddpm")
    ref = ref_mod.DDPM(
        model=_DuckDenoiserTorch(), timesteps=T, beta_schedule="linear",
        linear_start=0.0015, linear_end=0.0195, use_ema=False,
        objective=parameterization, v_posterior=v_posterior,
        original_elbo_weight=original_elbo_weight, l_simple_weight=1.0,
        hardcode_betaN=hardcode_betaN, log_every_t=None,
        loss_function="mean_squared_error",
    )
    ref.eval()

    from dyffusion_tpu.diffusion.ddpm_latent import LatentDDPMConfig, LatentDDPMEngine

    ours = LatentDDPMEngine(
        LatentDDPMConfig(
            timesteps=T, beta_schedule="linear", linear_start=0.0015,
            linear_end=0.0195, parameterization=parameterization,
            v_posterior=v_posterior, original_elbo_weight=original_elbo_weight,
            l_simple_weight=1.0, hardcode_betaN=hardcode_betaN,
        ),
        denoiser_apply=_duck_denoiser_apply, sample_shape=(C, HGT, WID),
    )
    return ref, ours


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(31)
    x = rng.normal(size=(B, C, HGT, WID)).astype(np.float32)
    cond = rng.normal(size=(B, SC, HGT, WID)).astype(np.float32)
    return x, cond


@pytest.mark.parametrize("parameterization,v_posterior", [
    ("pred_noise", 0.0), ("pred_noise", 0.2), ("pred_x0", 0.0),
])
def test_register_schedule_buffers(parameterization, v_posterior):
    """All register_schedule buffers incl. v_posterior blending + lvlb
    weights (ref :94-164)."""
    ref, ours = _build_pair(parameterization, v_posterior=v_posterior)
    for name in (
        "betas", "alphas_cumprod", "sqrt_alphas_cumprod",
        "sqrt_one_minus_alphas_cumprod", "sqrt_recip_alphas_cumprod",
        "sqrt_recipm1_alphas_cumprod", "posterior_variance",
        "posterior_log_variance_clipped", "posterior_mean_coef1",
        "posterior_mean_coef2", "lvlb_weights",
    ):
        np.testing.assert_allclose(
            np.asarray(getattr(ours, name)), getattr(ref, name).numpy(),
            rtol=1e-6, atol=1e-7, err_msg=name)


@pytest.mark.parametrize("parameterization,elbo_w", [
    ("pred_noise", 0.0), ("pred_noise", 0.1), ("pred_x0", 0.1),
])
def test_p_losses_parity(parameterization, elbo_w, data):
    """simple + VLB loss mixing with matched q_sample noise (ref :301-328)."""
    x, cond = data
    ref, ours = _build_pair(parameterization, original_elbo_weight=elbo_w)

    key = jax.random.key(13)
    k_noise, _ = jax.random.split(key)
    noise = jax.random.normal(k_noise, x.shape)
    t = np.array([0, T - 1], np.int64)

    with torch.no_grad():
        ref_dict = ref.p_losses(
            torch.from_numpy(x), torch.from_numpy(cond),
            t=torch.from_numpy(t), noise=torch.from_numpy(np.asarray(noise)),
        )
    loss, aux = ours.p_losses(None, key, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(t))
    np.testing.assert_allclose(float(loss), float(ref_dict["loss"]), rtol=2e-5)
    np.testing.assert_allclose(
        float(aux["loss_vlb"]), float(ref_dict["val/loss_vlb"]), rtol=2e-5)


@pytest.mark.parametrize("v_posterior", [0.0, 0.2])
def test_ancestral_sampler_parity(v_posterior, data):
    """Full T-step p_sample_loop (ref :241-277) with the reference replaying
    OUR scan's init + per-step noise (the t=0 draw exists both sides and is
    masked to zero both sides)."""
    _, cond = data
    ref, ours = _build_pair("pred_noise", v_posterior=v_posterior)

    key = jax.random.key(17)
    shape = (B, C, HGT, WID)
    k_init, k_loop = jax.random.split(key)
    img0 = jax.random.normal(k_init, shape)
    noises = [jax.random.normal(jax.random.fold_in(k_loop, t), shape)
              for t in range(T - 1, -1, -1)]
    queue = _NoiseQueue([img0] + noises)

    orig_randn, orig_like = torch.randn, torch.randn_like
    torch.randn, torch.randn_like = queue.randn, queue.randn_like
    try:
        with torch.no_grad():
            ref_out = ref.sample(torch.from_numpy(cond))["preds"].numpy()
    finally:
        torch.randn, torch.randn_like = orig_randn, orig_like
    assert not queue.q

    out = np.asarray(ours.sample(None, key, jnp.asarray(cond)))
    np.testing.assert_allclose(out, ref_out, rtol=2e-4, atol=2e-5)
