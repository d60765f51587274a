"""Gaussian diffusion baseline (DDPM ancestral + DDIM sampling), TPU-native.

Capability parity with the reference's ``GaussianDiffusion``
(``src/diffusion/denoising_diffusion.py:45-337``): linear/cosine beta
schedules with all cumprod buffers (``:76-149``), ``pred_noise``/``pred_x0``
objectives (``:70-74,171-185``), the ancestral sampler (``p_sample_loop
:203-236``) and DDIM with eta (``ddim_sample :238-279``), ``q_sample``
(``:290-298``) and the noise-prediction loss (``p_losses :300-337``) with the
optional p2 loss reweighting buffer (``:146-149``; registered but not applied
by default, matching the reference ``:334-336``).

TPU-first: both samplers are single ``lax.scan`` loops over precomputed
per-step coefficient arrays — no host round-trips; the denoiser is an
apply-fn closure, the condition rides in the carry closure.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dyffusion_tpu.diffusion.schedules import cosine_beta_schedule, linear_beta_schedule

Array = jnp.ndarray


@dataclass(frozen=True)
class GaussianDiffusionConfig:
    timesteps: int = 1000
    sampling_timesteps: Optional[int] = None  # < timesteps => DDIM
    objective: str = "pred_noise"  # 'pred_noise' | 'pred_x0'
    beta_schedule: str = "cosine"  # 'linear' | 'cosine'
    ddim_sampling_eta: float = 1.0
    hardcode_betaN: bool = False
    p2_loss_weight_gamma: float = 0.0
    p2_loss_weight_k: float = 1.0
    clip_denoised: bool = False

    def __post_init__(self):
        assert self.objective in ("pred_noise", "pred_x0")


class GaussianDiffusionEngine:
    """Stateless DDPM/DDIM engine over a denoiser apply-fn.

    Args:
        denoiser_apply: ``(variables, x, time, condition, rng) -> model_out``.
        sample_shape: (H, W, C) of one sample (C = stacked-horizon channels
        for the simultaneous forecasting host; ref ``sample :281-288``).
    """

    def __init__(
        self,
        config: GaussianDiffusionConfig,
        denoiser_apply: Callable,
        sample_shape: Tuple[int, int, int],
        criterion: Optional[Callable] = None,
    ):
        from dyffusion_tpu.utils.loss import mse_loss

        self.cfg = config
        self.denoiser_apply = denoiser_apply
        self.sample_shape = tuple(sample_shape)
        self.criterion = criterion or mse_loss

        T = config.timesteps
        if config.beta_schedule == "linear":
            betas = linear_beta_schedule(T)
        elif config.beta_schedule == "cosine":
            betas = cosine_beta_schedule(T)
        else:
            raise ValueError(f"unknown beta schedule {config.beta_schedule}")
        alphas = 1.0 - betas
        ac = np.cumprod(alphas)
        ac_prev = np.concatenate([[1.0], ac[:-1]])

        self.num_timesteps = T
        self.sampling_timesteps = config.sampling_timesteps or T
        assert self.sampling_timesteps <= T
        self.is_ddim_sampling = self.sampling_timesteps < T

        sqrt_ac = np.sqrt(ac)
        sqrt_1m_ac = np.sqrt(1.0 - ac)
        if config.hardcode_betaN:
            # force the terminal step to pure noise (ref ``:122-124``)
            sqrt_ac[-1] = 0.0
            sqrt_1m_ac[-1] = 1.0

        f32 = lambda a: jnp.asarray(a, jnp.float32)
        self.betas = f32(betas)
        self.alphas_cumprod = f32(ac)
        self.sqrt_alphas_cumprod = f32(sqrt_ac)
        self.sqrt_one_minus_alphas_cumprod = f32(sqrt_1m_ac)
        self.sqrt_recip_alphas_cumprod = f32(np.sqrt(1.0 / ac))
        self.sqrt_recipm1_alphas_cumprod = f32(np.sqrt(1.0 / ac - 1.0))
        post_var = betas * (1.0 - ac_prev) / (1.0 - ac)
        self.posterior_variance = f32(post_var)
        self.posterior_log_variance_clipped = f32(np.log(np.clip(post_var, 1e-20, None)))
        self.posterior_mean_coef1 = f32(betas * np.sqrt(ac_prev) / (1.0 - ac))
        self.posterior_mean_coef2 = f32((1.0 - ac_prev) * np.sqrt(alphas) / (1.0 - ac))
        self.p2_loss_weight = f32(
            (config.p2_loss_weight_k + ac / (1.0 - ac)) ** -config.p2_loss_weight_gamma
        )

    # -- helpers ------------------------------------------------------------
    @staticmethod
    def _extract(buf: Array, t: Array, ndim: int) -> Array:
        """Gather per-row coefficients and broadcast over trailing dims
        (ref ``utils.extract_into_tensor``)."""
        return buf[t.astype(jnp.int32)].reshape((-1,) + (1,) * (ndim - 1))

    def q_sample(self, x_start: Array, t: Array, noise: Array) -> Array:
        """Forward noising q(x_t | x_0) (ref ``:290-298``)."""
        return (
            self._extract(self.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + self._extract(self.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
        )

    def predict_start_from_noise(self, x_t, t, noise):
        return (
            self._extract(self.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - self._extract(self.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise
        )

    def predict_noise_from_start(self, x_t, t, x0):
        return (
            self._extract(self.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - x0
        ) / self._extract(self.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)

    def model_predictions(self, variables, x, t, condition):
        """(pred_noise, x_start) under either objective (ref ``:171-185``)."""
        out = self.denoiser_apply(variables, x, t.astype(jnp.float32), condition, None)
        if self.cfg.objective == "pred_noise":
            pred_noise = out
            x_start = self.predict_start_from_noise(x, t, pred_noise)
            if self.cfg.clip_denoised:
                x_start = jnp.clip(x_start, -1.0, 1.0)
        else:
            x_start = jnp.clip(out, -1.0, 1.0) if self.cfg.clip_denoised else out
            pred_noise = self.predict_noise_from_start(x, t, x_start)
        return pred_noise, x_start

    # -- training -----------------------------------------------------------
    def p_losses(self, variables, rng, x_start: Array, condition: Array, t: Array):
        """Denoising loss at per-row steps t (ref ``:300-337``)."""
        k_noise, k_drop = jax.random.split(rng)
        noise = jax.random.normal(k_noise, x_start.shape, x_start.dtype)
        x_t = self.q_sample(x_start, t, noise)
        preds = self.denoiser_apply(variables, x_t, t.astype(jnp.float32), condition, k_drop)
        target = noise if self.cfg.objective == "pred_noise" else x_start
        loss = self.criterion(preds, target)
        return loss, {"loss": loss}

    def loss(self, variables, rng, x_start: Array, condition: Array):
        """t ~ U{0..T-1} + p_losses (ref ``_base_diffusion.py:81-106``)."""
        k_t, k_loss = jax.random.split(rng)
        t = jax.random.randint(k_t, (x_start.shape[0],), 0, self.num_timesteps)
        return self.p_losses(variables, k_loss, x_start, condition, t)

    # -- sampling -----------------------------------------------------------
    def p_sample_loop(self, variables, rng, condition: Array) -> Array:
        """Ancestral sampler as one lax.scan over T steps (ref ``:203-236``)."""
        B = condition.shape[0]
        shape = (B,) + self.sample_shape
        k_init, k_loop = jax.random.split(rng)
        img0 = jax.random.normal(k_init, shape)
        ts = jnp.arange(self.num_timesteps - 1, -1, -1)

        def body(img, t):
            t_b = jnp.full((B,), t)
            _, x_start = self.model_predictions(variables, img, t_b, condition)
            mean = (
                self._extract(self.posterior_mean_coef1, t_b, img.ndim) * x_start
                + self._extract(self.posterior_mean_coef2, t_b, img.ndim) * img
            )
            log_var = self._extract(self.posterior_log_variance_clipped, t_b, img.ndim)
            noise = jax.random.normal(jax.random.fold_in(k_loop, t), shape)
            noise = jnp.where(t > 0, noise, jnp.zeros_like(noise))  # no noise at t=0
            img = mean + jnp.exp(0.5 * log_var) * noise
            return img, None

        img, _ = jax.lax.scan(body, img0, ts)
        return img

    def ddim_sample(self, variables, rng, condition: Array) -> Array:
        """DDIM sampler as one lax.scan over the subsampled schedule
        (ref ``:238-279``)."""
        B = condition.shape[0]
        shape = (B,) + self.sample_shape
        cfg = self.cfg
        times = np.linspace(-1, self.num_timesteps - 1, self.sampling_timesteps + 1).astype(int)
        times = list(reversed(times.tolist()))
        pairs = np.asarray(list(zip(times[:-1], times[1:])), np.int32)  # (S, 2)

        k_init, k_loop = jax.random.split(rng)
        img0 = jax.random.normal(k_init, shape)
        ac = self.alphas_cumprod

        def body(img, pair_and_idx):
            pair, idx = pair_and_idx
            t, t_next = pair[0], pair[1]
            t_b = jnp.full((B,), t)
            pred_noise, x_start = self.model_predictions(variables, img, t_b, condition)
            alpha = ac[t]
            alpha_next = jnp.where(t_next >= 0, ac[jnp.maximum(t_next, 0)], 1.0)
            sigma = cfg.ddim_sampling_eta * jnp.sqrt(
                jnp.clip((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha), 0.0, None)
            )
            c = jnp.sqrt(jnp.clip(1 - alpha_next - sigma**2, 0.0, None))
            noise = jax.random.normal(jax.random.fold_in(k_loop, idx), shape)
            stepped = x_start * jnp.sqrt(alpha_next) + c * pred_noise + sigma * noise
            img = jnp.where(t_next < 0, x_start, stepped)
            return img, None

        img, _ = jax.lax.scan(body, img0, (jnp.asarray(pairs), jnp.arange(len(pairs))))
        return img

    def sample(self, variables, rng, condition: Array) -> Array:
        """DDPM or DDIM depending on ``sampling_timesteps`` (ref ``:281-288``)."""
        if self.is_ddim_sampling:
            return self.ddim_sample(variables, rng, condition)
        return self.p_sample_loop(variables, rng, condition)
