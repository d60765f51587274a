"""LDM-style DDPM variant (the reference's second DDPM implementation).

Capability parity with ``src/diffusion/ddpm.py:28-424`` (the CompVis
latent-diffusion port) — the features it adds over the lucidrains-style
:class:`~dyffusion_tpu.diffusion.ddpm.GaussianDiffusionEngine`:

- ``make_beta_schedule`` schedules with explicit linear_start/linear_end/
  cosine_s and optional ``given_betas`` / ``hardcode_betaN`` (ref ``:94-113``),
- ``v_posterior`` blending of the posterior variance (ref ``:139-143``),
- the ELBO/VLB loss term: per-row simple loss reweighted by ``lvlb_weights``
  with ``l_simple_weight`` + ``original_elbo_weight`` mixing (ref ``:146-165,
  301-328``), incl. the optional learnable per-timestep ``logvar``
  (ref ``:89-92``: ``loss_simple / exp(logvar_t) + logvar_t``),
- ancestral sampler with ``clip_denoised`` (ref ``:252-269``).

EMA and checkpoint-key filtering (ref ``:69-71, 182-199``) live in the
framework's TrainState/checkpoint layer rather than inside the engine.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dyffusion_tpu.diffusion.schedules import make_beta_schedule

Array = jnp.ndarray


@dataclass(frozen=True)
class LatentDDPMConfig:
    timesteps: int = 1000
    beta_schedule: str = "linear"
    linear_start: float = 1e-4
    linear_end: float = 2e-2
    cosine_s: float = 8e-3
    parameterization: str = "pred_noise"  # 'pred_noise' | 'pred_x0'
    v_posterior: float = 0.0
    l_simple_weight: float = 1.0
    original_elbo_weight: float = 0.0
    learn_logvar: bool = False
    logvar_init: float = 0.0
    hardcode_betaN: bool = False
    clip_denoised: bool = False
    # 'l1'/'mae' or 'l2'/'mse' (ref get_loss_value :286-295; 'mse' default
    # matches the class default, the composed configs pass 'l1')
    loss_function: str = "mse"

    def __post_init__(self):
        assert self.parameterization in ("pred_noise", "pred_x0")


class LatentDDPMEngine:
    """Stateless LDM-DDPM engine over a denoiser apply-fn.

    If ``config.learn_logvar`` the per-timestep logvar is a trainable array
    the caller threads through ``extra_params`` (shape (T,)); otherwise the
    constant ``logvar_init`` is used (ref ``ddpm.py:89-92``).
    """

    def __init__(
        self,
        config: LatentDDPMConfig,
        denoiser_apply: Callable,
        sample_shape: Tuple[int, int, int],
        given_betas: Optional[np.ndarray] = None,
    ):
        self.cfg = config
        self.denoiser_apply = denoiser_apply
        self.sample_shape = tuple(sample_shape)

        betas = (
            np.asarray(given_betas, np.float64)
            if given_betas is not None
            else make_beta_schedule(
                config.beta_schedule, config.timesteps,
                linear_start=config.linear_start, linear_end=config.linear_end,
                cosine_s=config.cosine_s,
            )
        )
        if config.hardcode_betaN:
            betas[-1] = 1.0
        alphas = 1.0 - betas
        ac = np.cumprod(alphas)
        ac_prev = np.append(1.0, ac[:-1])
        self.num_timesteps = len(betas)

        v = config.v_posterior
        post_var = (1 - v) * betas * (1.0 - ac_prev) / (1.0 - ac) + v * betas

        f32 = lambda a: jnp.asarray(a, jnp.float32)
        self.betas = f32(betas)
        self.alphas_cumprod = f32(ac)
        self.sqrt_alphas_cumprod = f32(np.sqrt(ac))
        self.sqrt_one_minus_alphas_cumprod = f32(np.sqrt(1.0 - ac))
        self.sqrt_recip_alphas_cumprod = f32(np.sqrt(1.0 / ac))
        self.sqrt_recipm1_alphas_cumprod = f32(np.sqrt(1.0 / ac - 1.0))
        self.posterior_variance = f32(post_var)
        self.posterior_log_variance_clipped = f32(np.log(np.maximum(post_var, 1e-20)))
        self.posterior_mean_coef1 = f32(betas * np.sqrt(ac_prev) / (1.0 - ac))
        self.posterior_mean_coef2 = f32((1.0 - ac_prev) * np.sqrt(alphas) / (1.0 - ac))

        # VLB weights (ref :146-162); index 0 copies index 1. Computed in
        # float32 from the f32-cast buffers, exactly as the reference does
        # (its ``to_torch`` buffers are f32 before this formula runs) — the
        # index-0 division by post_var=0 yields inf and is overwritten.
        b32, pv32 = betas.astype(np.float32), post_var.astype(np.float32)
        a32, ac32 = alphas.astype(np.float32), ac.astype(np.float32)
        with np.errstate(divide="ignore"):
            if config.parameterization == "pred_noise":
                lvlb = b32**2 / (2 * pv32 * a32 * (1 - ac32))
            else:
                lvlb = 0.5 * np.sqrt(ac32) / (2.0 * 1 - ac32)
        lvlb[0] = lvlb[1]
        self.lvlb_weights = f32(lvlb)
        assert not np.isnan(lvlb).all()

    def init_logvar(self) -> Array:
        return jnp.full((self.num_timesteps,), self.cfg.logvar_init, jnp.float32)

    @staticmethod
    def _extract(buf: Array, t: Array, ndim: int) -> Array:
        return buf[t.astype(jnp.int32)].reshape((-1,) + (1,) * (ndim - 1))

    def q_sample(self, x_start: Array, t: Array, noise: Array) -> Array:
        return (
            self._extract(self.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + self._extract(self.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
        )

    # -- training (ref p_losses :301-328) -----------------------------------
    def p_losses(self, variables, rng, x_start: Array, condition: Array, t: Array, logvar: Optional[Array] = None):
        cfg = self.cfg
        k_noise, k_drop = jax.random.split(rng)
        noise = jax.random.normal(k_noise, x_start.shape, x_start.dtype)
        x_noisy = self.q_sample(x_start, t, noise)
        model_out = self.denoiser_apply(variables, x_noisy, t.astype(jnp.float32), condition, k_drop)
        target = noise if cfg.parameterization == "pred_noise" else x_start

        # per-row loss (ref get_loss_value :286-295): l1 or squared, then
        # mean over non-batch axes — the composed reference configs use l1
        # (configs/diffusion/_base.yaml loss_function: "l1")
        err = model_out - target
        per_elem = jnp.abs(err) if cfg.loss_function in ("l1", "mae") else err**2
        per_row = jnp.mean(per_elem, axis=tuple(range(1, x_start.ndim)))
        loss_simple = jnp.mean(per_row)
        if logvar is not None:
            lv_t = logvar[t.astype(jnp.int32)]
            loss_simple = jnp.mean(per_row / jnp.exp(lv_t) + lv_t)
        loss_vlb = jnp.mean(self.lvlb_weights[t.astype(jnp.int32)] * per_row)
        loss = cfg.l_simple_weight * loss_simple + cfg.original_elbo_weight * loss_vlb
        return loss, {"loss": loss, "loss_simple": loss_simple, "loss_vlb": loss_vlb}

    def loss(self, variables, rng, x_start: Array, condition: Array, logvar: Optional[Array] = None):
        k_t, k_loss = jax.random.split(rng)
        t = jax.random.randint(k_t, (x_start.shape[0],), 0, self.num_timesteps)
        return self.p_losses(variables, k_loss, x_start, condition, t, logvar)

    # -- sampling (ref p_sample_loop :252-269) ------------------------------
    def sample(self, variables, rng, condition: Array, return_intermediates: bool = False, log_every_t: int = 100):
        cfg = self.cfg
        B = condition.shape[0]
        shape = (B,) + self.sample_shape
        k_init, k_loop = jax.random.split(rng)
        img0 = jax.random.normal(k_init, shape)
        ts = jnp.arange(self.num_timesteps - 1, -1, -1)

        def body(img, t):
            t_b = jnp.full((B,), t)
            out = self.denoiser_apply(variables, img, t_b.astype(jnp.float32), condition, None)
            if cfg.parameterization == "pred_noise":
                x0 = (
                    self._extract(self.sqrt_recip_alphas_cumprod, t_b, img.ndim) * img
                    - self._extract(self.sqrt_recipm1_alphas_cumprod, t_b, img.ndim) * out
                )
            else:
                x0 = out
            if cfg.clip_denoised:
                x0 = jnp.clip(x0, -1.0, 1.0)
            mean = (
                self._extract(self.posterior_mean_coef1, t_b, img.ndim) * x0
                + self._extract(self.posterior_mean_coef2, t_b, img.ndim) * img
            )
            log_var = self._extract(self.posterior_log_variance_clipped, t_b, img.ndim)
            noise = jax.random.normal(jax.random.fold_in(k_loop, t), shape)
            noise = jnp.where(t > 0, noise, jnp.zeros_like(noise))
            new_img = mean + jnp.exp(0.5 * log_var) * noise
            return new_img, (new_img if return_intermediates else None)

        img, inter = jax.lax.scan(body, img0, ts)
        if return_intermediates:
            # ref ``p_sample_loop`` (ddpm.py:257-268) logs the image AFTER the
            # step at every t with ``t % log_every_t == 0 or t == T-1`` (so the
            # final t=0 denoised image IS included), preceded by the initial
            # noise (keyed t=T). Scan position p holds the post-step image of
            # t = T-1-p.
            lg = max(int(log_every_t), 1)
            T = self.num_timesteps
            idx = np.array(
                [T - 1 - t for t in range(T - 1, -1, -1) if t % lg == 0 or t == T - 1],
                np.int64,
            )
            return img, jnp.concatenate([img0[None], inter[idx]], axis=0)
        return img

    # -- diagnostics (ref log_images, ddpm.py:353-389) -----------------------
    def log_images(
        self,
        variables,
        rng,
        x_start: Array,
        condition: Array,
        n_row: int = 4,
        sample: bool = True,
        log_every_t: int = 100,
    ):
        """Visual diagnostics: inputs, the forward diffusion row (q_sample at
        log-spaced t), ancestral samples and the denoising row — the
        capability of the reference's ``log_images``; consumers save/plot the
        returned arrays."""
        n_row = min(n_row, x_start.shape[0])
        xs = x_start[:n_row]
        out = {"inputs": xs}
        k_noise, k_samp = jax.random.split(rng)
        noise = jax.random.normal(k_noise, xs.shape, xs.dtype)
        n_steps = min(10, self.num_timesteps)
        t_row = np.linspace(0, self.num_timesteps - 1, n_steps).astype(np.int32)
        out["diffusion_row"] = jnp.stack(
            [self.q_sample(xs, jnp.full((n_row,), int(t)), noise) for t in t_row]
        )
        if sample:
            samples, denoise_row = self.sample(
                variables, k_samp, condition[:n_row],
                return_intermediates=True, log_every_t=log_every_t,
            )
            out["samples"] = samples
            out["denoise_row"] = denoise_row
        return out


def make_conditioned_apply(apply_fn: Callable, conditioning_key: Optional[str]) -> Callable:
    """LDM ``DiffusionWrapper`` equivalent (ref ``ddpm.py:398-424``).

    Routes conditioning into a denoiser apply-fn by mode (config-unused in the
    reference — no Hydra preset constructs a DiffusionWrapper — kept for
    inventory parity):

    - ``None``: ``apply_fn(x, t)``
    - ``'concat'``: channel-concat ``c_concat`` onto ``x`` (NHWC axis -1)
    - ``'crossattn'``: channel-concat ``c_crossattn`` passed as ``context=``
    - ``'hybrid'``: both of the above
    - ``'adm'``: first ``c_crossattn`` entry passed as class label ``y=``

    ``c_concat`` / ``c_crossattn`` are lists of arrays, as in the reference.
    """
    assert conditioning_key in (None, "concat", "crossattn", "hybrid", "adm"), (
        f"unknown conditioning_key {conditioning_key!r}"
    )

    def wrapped(x: Array, t: Array, c_concat=None, c_crossattn=None) -> Array:
        if conditioning_key is None:
            return apply_fn(x, t)
        if conditioning_key == "concat":
            return apply_fn(jnp.concatenate([x, *c_concat], axis=-1), t)
        if conditioning_key == "crossattn":
            return apply_fn(x, t, context=jnp.concatenate(c_crossattn, axis=-1))
        if conditioning_key == "hybrid":
            return apply_fn(
                jnp.concatenate([x, *c_concat], axis=-1),
                t,
                context=jnp.concatenate(c_crossattn, axis=-1),
            )
        return apply_fn(x, t, y=c_crossattn[0])  # 'adm'

    return wrapped
