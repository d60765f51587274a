"""Gaussian-diffusion engines: buffers, q_sample statistics, samplers, VLB loss."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dyffusion_tpu.diffusion.ddpm import GaussianDiffusionConfig, GaussianDiffusionEngine
from dyffusion_tpu.diffusion.ddpm_latent import LatentDDPMConfig, LatentDDPMEngine


def _toy_denoiser(variables, x, t, cond, rng):
    w = variables
    tb = t.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
    c = 0.0 if cond is None else 0.05 * cond[..., : x.shape[-1]]
    return 0.1 * w * x + 0.001 * tb + c


def test_gaussian_buffers_consistency():
    eng = GaussianDiffusionEngine(
        GaussianDiffusionConfig(timesteps=50, beta_schedule="cosine"),
        _toy_denoiser, (4, 4, 1),
    )
    ac = np.asarray(eng.alphas_cumprod)
    assert np.all(np.diff(ac) < 0) and 0 < ac[-1] < ac[0] <= 1
    np.testing.assert_allclose(
        np.asarray(eng.sqrt_recipm1_alphas_cumprod), np.sqrt(1 / ac - 1), rtol=1e-5
    )
    # posterior variance matches beta * (1-ac_prev)/(1-ac)
    ac_prev = np.append(1.0, ac[:-1])
    want = np.asarray(eng.betas) * (1 - ac_prev) / (1 - ac)
    np.testing.assert_allclose(np.asarray(eng.posterior_variance), want, rtol=1e-4)


def test_q_sample_statistics():
    eng = GaussianDiffusionEngine(GaussianDiffusionConfig(timesteps=100), _toy_denoiser, (4, 4, 1))
    x0 = jnp.ones((2048, 1))
    t = jnp.full((2048,), 50)
    noise = jax.random.normal(jax.random.key(0), x0.shape)
    xt = eng.q_sample(x0, t, noise)
    a = float(eng.alphas_cumprod[50])
    assert abs(float(jnp.mean(xt)) - np.sqrt(a)) < 0.05
    assert abs(float(jnp.std(xt)) - np.sqrt(1 - a)) < 0.05


def test_pred_noise_pred_x0_roundtrip():
    eng = GaussianDiffusionEngine(GaussianDiffusionConfig(timesteps=20), _toy_denoiser, (4, 4, 1))
    x_t = jax.random.normal(jax.random.key(1), (3, 4, 4, 1))
    noise = jax.random.normal(jax.random.key(2), x_t.shape)
    t = jnp.array([3, 9, 15])
    x0 = eng.predict_start_from_noise(x_t, t, noise)
    noise_back = eng.predict_noise_from_start(x_t, t, x0)
    np.testing.assert_allclose(np.asarray(noise_back), np.asarray(noise), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("sampling_timesteps", [None, 5])
def test_gaussian_samplers_finite(sampling_timesteps):
    eng = GaussianDiffusionEngine(
        GaussianDiffusionConfig(timesteps=10, sampling_timesteps=sampling_timesteps),
        _toy_denoiser, (4, 4, 2),
    )
    cond = jnp.ones((2, 4, 4, 2))
    out = jax.jit(lambda r, c: eng.sample(jnp.float32(1.0), r, c))(jax.random.key(0), cond)
    assert out.shape == (2, 4, 4, 2) and bool(jnp.all(jnp.isfinite(out)))
    assert eng.is_ddim_sampling == (sampling_timesteps is not None)


def test_latent_ddpm_v_posterior_and_vlb():
    cfg = LatentDDPMConfig(timesteps=30, v_posterior=0.2, original_elbo_weight=0.1)
    eng = LatentDDPMEngine(cfg, _toy_denoiser, (4, 4, 1))
    # v_posterior blending (ref ddpm.py:139-143)
    betas = np.asarray(eng.betas)
    ac = np.asarray(eng.alphas_cumprod)
    ac_prev = np.append(1.0, ac[:-1])
    want = 0.8 * betas * (1 - ac_prev) / (1 - ac) + 0.2 * betas
    np.testing.assert_allclose(np.asarray(eng.posterior_variance), want, rtol=1e-3)
    # lvlb_weights[0] copies [1]
    lv = np.asarray(eng.lvlb_weights)
    assert lv[0] == lv[1]
    x = jax.random.normal(jax.random.key(3), (4, 4, 4, 1))
    cond = jnp.ones_like(x)
    loss, aux = eng.loss(jnp.float32(1.0), jax.random.key(4), x, cond)
    assert np.isfinite(float(loss))
    assert aux["loss_vlb"] > 0
    # learnable logvar path
    logvar = eng.init_logvar()
    loss2, aux2 = eng.loss(jnp.float32(1.0), jax.random.key(4), x, cond, logvar=logvar)
    assert np.isfinite(float(loss2))


def test_latent_ddpm_sampler_finite():
    eng = LatentDDPMEngine(LatentDDPMConfig(timesteps=8), _toy_denoiser, (4, 4, 1))
    cond = jnp.ones((2, 4, 4, 1))
    out = jax.jit(lambda r, c: eng.sample(jnp.float32(1.0), r, c))(jax.random.key(0), cond)
    assert out.shape == (2, 4, 4, 1) and bool(jnp.all(jnp.isfinite(out)))


def test_latent_ddpm_intermediates_timesteps_and_final_image():
    """ref ddpm.py:257-268: intermediates are keyed t = T (initial noise),
    then every t with ``t % log_every_t == 0 or t == T-1`` logged AFTER the
    step — so the final denoised (t=0) image is always the last entry."""
    T, lg = 8, 3
    eng = LatentDDPMEngine(LatentDDPMConfig(timesteps=T), _toy_denoiser, (4, 4, 1))
    cond = jnp.ones((2, 4, 4, 1))
    final, inter = eng.sample(
        jnp.float32(1.0), jax.random.key(0), cond,
        return_intermediates=True, log_every_t=lg,
    )
    # logged ts: initial(T=8), 7 (==T-1), 6, 3, 0
    assert inter.shape[0] == 5
    np.testing.assert_allclose(np.asarray(inter[-1]), np.asarray(final), rtol=1e-6)
    # entries differ (each is a different step of the chain)
    assert not np.allclose(np.asarray(inter[0]), np.asarray(inter[-1]))
