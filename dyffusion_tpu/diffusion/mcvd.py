"""MCVD video-diffusion head and sampler library, TPU-native.

Capability parity with the reference's ``UNetMore_DDPM``
(``src/diffusion/mcvd.py:17-177``) and the stand-alone sampler library
(``src/models/mcvd/__init__.py:17-417`` + ``pndm.py:4-58``):

- sigma/alpha schedules via ``get_sigmas`` (geometric/linear/cosine;
  ref ``__init__.py:17-33``) with the MCVD big-to-small index convention,
- optional Gamma-noise diffusion (k_cum / theta_t buffers; ref
  ``mcvd.py:48-58``) and noise-in-condition (``:89-110``),
- the noise-prediction loss (``p_losses :66-116``),
- DDPM sampler with subsample_steps / frac_steps / just_beta / final-denoise
  (ref ``ddpm_sampler :245-417``), DDIM sampler (``ddim_sampler :113-242``),
  and the FPNDM Runge-Kutta/Adams-Bashforth sampler (``FPNDM_sampler :37-110``
  + ``pndm.gen_order_4``), all as single ``lax.scan`` loops over precomputed
  per-step coefficient arrays — no host round-trips.

The annealed-Langevin (SMLD) family is config-unreachable in the reference
(SURVEY.md §7.2 step 8) and is provided as :func:`anneal_langevin_dynamics`
for completeness.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def get_sigmas(schedule: str, sigma_begin: float, sigma_end: float, timesteps: int) -> np.ndarray:
    """(ref ``src/models/mcvd/__init__.py:17-33``)."""
    T = timesteps
    if schedule == "geometric":
        return np.logspace(np.log10(sigma_begin), np.log10(sigma_end), T)
    if schedule == "linear":
        return np.linspace(sigma_begin, sigma_end, T)
    if schedule == "cosine":
        t = np.linspace(T, 0, T + 1) / T
        s = 0.008
        f = np.cos((t + s) / (1 + s) * np.pi / 2) ** 2
        return f[:-1] / f[-1]
    raise NotImplementedError(f"sigma schedule {schedule} not supported")


@dataclass(frozen=True)
class McvdConfig:
    version: str = "DDPM"  # 'DDPM' | 'DDIM' | 'FPNDM'
    timesteps: int = 1000
    beta_schedule: str = "linear"
    sigma_begin: float = 0.02
    sigma_end: float = 0.0001
    gamma: bool = False
    noise_in_cond: bool = False
    sampling_timesteps: Optional[int] = None  # subsample_steps
    frac_steps: Optional[float] = None
    just_beta: bool = False
    sampling_denoise: bool = True
    clip_before: bool = False

    def __post_init__(self):
        assert self.version.upper() in ("DDPM", "DDIM", "FPNDM")


class McvdEngine:
    """Stateless MCVD engine over a scorenet apply-fn.

    ``scorenet_apply(variables, x, time, condition, rng) -> z_pred`` (noise
    prediction; time is the integer step index in MCVD's big-to-small
    convention: step 0 = most noise).
    """

    def __init__(
        self,
        config: McvdConfig,
        scorenet_apply: Callable,
        sample_shape: Tuple[int, int, int],
        criterion: Optional[Callable] = None,
    ):
        from dyffusion_tpu.utils.loss import mse_loss

        self.cfg = config
        self.scorenet_apply = scorenet_apply
        self.sample_shape = tuple(sample_shape)
        self.criterion = criterion or mse_loss

        T = config.timesteps
        # MCVD index convention: arrays run big-noise -> small-noise
        # (ref mcvd.py:40-47). All buffer math stays in float32 to match the
        # reference's torch-f32 cumprod chain bit-for-bit: the 1/(1-alpha)
        # sampler coefficients amplify the f32-vs-f64 cumprod difference to
        # ~1e-3 relative, which golden-parity tests (and checkpoints trained
        # against the reference) are sensitive to.
        if config.beta_schedule == "linear":
            betas = get_sigmas("linear", config.sigma_begin, config.sigma_end, T).astype(np.float32)
            alphas = np.cumprod((1.0 - betas)[::-1])[::-1]
            alphas_prev = np.concatenate([alphas[1:], np.ones(1, np.float32)])
        elif config.beta_schedule == "cosine":
            alphas = get_sigmas("cosine", config.sigma_begin, config.sigma_end, T).astype(np.float32)
            alphas_prev = np.concatenate([alphas[1:], np.ones(1, np.float32)])
            betas = 1.0 - alphas / alphas_prev
        else:
            raise ValueError(f"beta_schedule {config.beta_schedule} not supported")
        self.num_timesteps = len(betas)

        f32 = lambda a: jnp.asarray(np.ascontiguousarray(a), jnp.float32)
        self.betas, self.alphas, self.alphas_prev = f32(betas), f32(alphas), f32(alphas_prev)
        if config.gamma:
            theta_0 = np.float32(0.001)
            k = betas / (alphas * theta_0**2)  # (ref mcvd.py:50-58)
            k_cum = np.cumsum(k[::-1])[::-1]
            theta_t = np.sqrt(alphas) * theta_0
            self.k_cum, self.theta_t = f32(k_cum), f32(theta_t)
            self.theta_0 = theta_0

    # ------------------------------------------------------------------
    def _noise_like(self, rng, shape, t: Array) -> Array:
        """Standard normal, or normalized Gamma noise (ref mcvd.py:78-85)."""
        if not self.cfg.gamma:
            return jax.random.normal(rng, shape)
        bshape = (-1,) + (1,) * (len(shape) - 1)
        k = self.k_cum[t.astype(jnp.int32)].reshape(bshape)
        theta = self.theta_t[t.astype(jnp.int32)].reshape(bshape)
        alpha = self.alphas[t.astype(jnp.int32)].reshape(bshape)
        z = jax.random.gamma(rng, jnp.broadcast_to(k, shape)) * theta
        return (z - k * theta) / jnp.sqrt(1.0 - alpha)

    def p_losses(self, variables, rng, x: Array, condition: Array, t: Array):
        """Noise-prediction loss at per-row steps t (ref mcvd.py:66-116)."""
        k_z, k_cond, k_drop = jax.random.split(rng, 3)
        bshape = (-1,) + (1,) * (x.ndim - 1)
        used_alphas = self.alphas[t.astype(jnp.int32)].reshape(bshape)
        z = self._noise_like(k_z, x.shape, t)
        perturbed = jnp.sqrt(used_alphas) * x + jnp.sqrt(1.0 - used_alphas) * z

        if self.cfg.noise_in_cond and condition is not None:
            ca = self.alphas[t.astype(jnp.int32)].reshape((-1,) + (1,) * (condition.ndim - 1))
            zc = self._noise_like(k_cond, condition.shape, t)
            condition = jnp.sqrt(ca) * condition + jnp.sqrt(1.0 - ca) * zc

        z_pred = self.scorenet_apply(variables, perturbed, t.astype(jnp.float32), condition, k_drop)
        loss = self.criterion(z_pred, z)
        return loss, {"loss": loss}

    def loss(self, variables, rng, x: Array, condition: Array):
        k_t, k_loss = jax.random.split(rng)
        t = jax.random.randint(k_t, (x.shape[0],), 0, self.num_timesteps)
        return self.p_losses(variables, k_loss, x, condition, t)

    # ------------------------------------------------------------------
    def _subsampled_schedule(self):
        """Step indices + per-step coefficient arrays after subsample/frac
        (ref ddpm_sampler :280-310)."""
        cfg = self.cfg
        alphas = np.asarray(self.alphas)
        alphas_prev = np.asarray(self.alphas_prev)
        betas = np.asarray(self.betas)
        steps = np.arange(len(betas))
        if cfg.sampling_timesteps is not None and cfg.sampling_timesteps < len(alphas):
            skip = len(alphas) // cfg.sampling_timesteps
            steps = np.arange(0, len(alphas), skip)
            alphas = alphas[steps]
            # stay in f32 like the reference ("we lose a bit of precision
            # here", ref ddpm_sampler :289)
            alphas_prev = np.concatenate([alphas[1:], np.ones(1, np.float32)])
            betas = 1.0 - alphas / alphas_prev
        else:
            alphas, alphas_prev, betas = alphas[steps], alphas_prev[steps], betas[steps]
        if cfg.frac_steps is not None:
            keep = slice(int((1 - cfg.frac_steps) * len(steps)), None)
            steps, alphas, alphas_prev, betas = steps[keep], alphas[keep], alphas_prev[keep], betas[keep]
        return steps, alphas, alphas_prev, betas

    def _init_sample(self, rng, B):
        shape = (B,) + self.sample_shape
        if self.cfg.gamma:
            k0 = float(np.asarray(self.k_cum)[0])
            th0 = float(np.asarray(self.theta_t)[0])
            z = jax.random.gamma(rng, jnp.full(shape, k0)) * th0
            return z - k0 * th0  # not scaled (ref mcvd.py:148-155)
        return jax.random.normal(rng, shape)

    def ddpm_sample(self, variables, rng, condition: Array) -> Array:
        """Ancestral MCVD sampler as one scan (ref ddpm_sampler :245-417)."""
        cfg = self.cfg
        B = condition.shape[0]
        steps, alphas, alphas_prev, betas = self._subsampled_schedule()
        n = len(steps)
        k_init, k_loop, k_den = jax.random.split(rng, 3)
        x0_mod = self._init_sample(k_init, B)

        xs = (
            jnp.asarray(steps, jnp.float32),
            jnp.asarray(alphas, jnp.float32),
            jnp.asarray(alphas_prev, jnp.float32),
            jnp.asarray(betas, jnp.float32),
            jnp.arange(n),
        )

        def body(x, inp):
            step, a, a_prev, beta, i = inp
            t_b = jnp.full((B,), step)
            grad = self.scorenet_apply(variables, x, t_b, condition, None)
            x0 = (x - jnp.sqrt(1.0 - a) * grad) / jnp.sqrt(a)
            if cfg.clip_before:
                x0 = jnp.clip(x0, -1.0, 1.0)
            x_new = (jnp.sqrt(a_prev) * beta / (1.0 - a)) * x0 + (
                jnp.sqrt(1.0 - beta) * (1.0 - a_prev) / (1.0 - a)
            ) * x
            noise = self._noise_like(
                jax.random.fold_in(k_loop, i), x.shape, jnp.full((B,), step)
            )
            sigma = jnp.sqrt(beta) if cfg.just_beta else jnp.sqrt((1.0 - a_prev) / (1.0 - a) * beta)
            x_new = jnp.where(i + 1 < n, x_new + sigma * noise, x_new)  # no noise at last step
            return x_new, None

        x, _ = jax.lax.scan(body, x0_mod, xs)
        if cfg.sampling_denoise:  # final denoise (ref :405-408); NOTE the
            # reference conditions this call on num_steps-1 (the step COUNT),
            # not steps[-1] (the original index) — they differ under
            # subsampling; we match the reference.
            t_b = jnp.full((B,), float(n - 1))
            x = x - jnp.sqrt(1.0 - alphas[-1]) * self.scorenet_apply(variables, x, t_b, condition, None)
        return x

    def ddim_sample(self, variables, rng, condition: Array) -> Array:
        """MCVD DDIM sampler as one scan (ref ddim_sampler :113-242)."""
        cfg = self.cfg
        B = condition.shape[0]
        steps, alphas, alphas_prev, betas = self._subsampled_schedule()
        k_init, _ = jax.random.split(rng)
        x0_mod = self._init_sample(k_init, B)
        xs = (
            jnp.asarray(steps, jnp.float32),
            jnp.asarray(alphas, jnp.float32),
            jnp.asarray(alphas_prev, jnp.float32),
        )

        def body(x, inp):
            step, a, a_prev = inp
            t_b = jnp.full((B,), step)
            grad = self.scorenet_apply(variables, x, t_b, condition, None)
            x0 = (x - jnp.sqrt(1.0 - a) * grad) / jnp.sqrt(a)
            if cfg.clip_before:
                x0 = jnp.clip(x0, -1.0, 1.0)
            x = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * grad
            return x, None

        x, _ = jax.lax.scan(body, x0_mod, xs)
        if cfg.sampling_denoise:
            # ref ddim_sampler :232-234 conditions on L-1 (step count), as in
            # ddpm_sample above
            t_b = jnp.full((B,), float(len(steps) - 1))
            x = x - jnp.sqrt(1.0 - alphas[-1]) * self.scorenet_apply(variables, x, t_b, condition, None)
        return x

    def fpndm_sample(self, variables, rng, condition: Array) -> Array:
        """F-PNDM: Runge-Kutta warmup + 4th-order Adams-Bashforth
        (ref FPNDM_sampler :37-110 + pndm.py:4-58), as one scan with the
        noise history in the carry."""
        cfg = self.cfg
        B = condition.shape[0]
        alphas = np.asarray(self.alphas)
        sub = cfg.sampling_timesteps or self.num_timesteps
        skip = max(len(alphas) // sub, 1)
        steps = list(range(0, len(alphas), skip))
        steps_next = [-1] + steps[:-1]
        # alphas_cump indexed by t+1 over the flipped (small-to-big) array
        alphas_old = jnp.asarray(alphas[::-1].copy(), jnp.float32)

        k_init, _ = jax.random.split(rng)
        x = self._init_sample(k_init, B)

        def model(xv, t):
            return self.scorenet_apply(variables, xv, t, condition, None)

        def transfer(xv, t, t_next, et):
            # NB the reference indexes ``alphas_cump[t.long() + 1]`` — it
            # TRUNCATES t toward zero FIRST, then adds 1 (pndm.py:24-25).
            # For the fractional RK midpoints this differs from trunc(t+1):
            # t=-0.5 gives index trunc(-0.5)+1 = 1, not trunc(0.5) = 0.
            at = alphas_old[t.astype(jnp.int32) + 1].reshape(-1, 1, 1, 1)
            at_next = alphas_old[t_next.astype(jnp.int32) + 1].reshape(-1, 1, 1, 1)
            x_delta = (at_next - at) * (
                (1.0 / (jnp.sqrt(at) * (jnp.sqrt(at) + jnp.sqrt(at_next)))) * xv
                - 1.0
                / (jnp.sqrt(at) * (jnp.sqrt((1 - at_next) * at) + jnp.sqrt((1 - at) * at_next)))
                * et
            )
            out = xv + x_delta
            if cfg.clip_before:
                out = jnp.clip(out, -1.0, 1.0)
            return out

        def runge_kutta(xv, t, t_next):
            t_mid = (t + t_next) / 2.0
            e1 = model(xv, t)
            x2 = transfer(xv, t, t_mid, e1)
            e2 = model(x2, t_mid)
            x3 = transfer(xv, t, t_mid, e2)
            e3 = model(x3, t_mid)
            x4 = transfer(xv, t, t_next, e3)
            e4 = model(x4, t_next)
            return (e1 + 2 * e2 + 2 * e3 + e4) / 6.0, e1

        n = len(steps)
        xs = (
            jnp.asarray(steps, jnp.float32),
            jnp.asarray(steps_next, jnp.float32),
            jnp.arange(n),
        )
        ets0 = jnp.zeros((4, B) + self.sample_shape)

        def body(carry, inp):
            xv, ets, count = carry
            step, step_next, i = inp
            t = jnp.full((B,), step)
            t_next = jnp.full((B,), step_next)

            def rk_branch(_):
                et, e1 = runge_kutta(xv, t, t_next)
                return et, e1

            def ab_branch(_):
                e_new = model(xv, t)
                et = (55 * e_new - 59 * ets[3] + 37 * ets[2] - 9 * ets[1]) / 24.0
                return et, e_new

            et, e_hist = jax.lax.cond(count > 2, ab_branch, rk_branch, None)
            ets = jnp.concatenate([ets[1:], e_hist[None]], axis=0)
            x_new = transfer(xv, t, t_next, et)
            return (x_new, ets, count + 1), None

        (x, _, _), _ = jax.lax.scan(body, (x, ets0, jnp.zeros((), jnp.int32)), xs)
        return x

    def sample(self, variables, rng, condition: Array) -> Array:
        v = self.cfg.version.upper()
        if v == "DDPM":
            return self.ddpm_sample(variables, rng, condition)
        if v == "DDIM":
            return self.ddim_sample(variables, rng, condition)
        return self.fpndm_sample(variables, rng, condition)


def anneal_langevin_dynamics(
    scorenet_apply,
    variables,
    rng,
    x_init: Array,
    condition: Array,
    sigmas: Array,
    n_steps_each: int = 1,
    step_lr: float = 2e-5,
    denoise: bool = True,
) -> Array:
    """Annealed Langevin dynamics (SMLD; ref ``anneal_Langevin_dynamics
    :419-516``) as nested scans. The scorenet returns z with
    score = -z / sigma."""
    B = x_init.shape[0]
    L = len(sigmas)
    sigmas = jnp.asarray(sigmas, jnp.float32)

    def level_body(x, inp):
        c, key = inp
        sigma = sigmas[c]
        step_size = step_lr * (sigma / sigmas[-1]) ** 2

        def step_body(x, k):
            t_b = jnp.full((B,), c, jnp.float32)
            grad = -scorenet_apply(variables, x, t_b, condition, None) / sigma
            noise = jax.random.normal(k, x.shape)
            return x + step_size * grad + jnp.sqrt(2.0 * step_size) * noise, None

        keys = jax.random.split(key, n_steps_each)
        x, _ = jax.lax.scan(step_body, x, keys)
        return x, None

    keys = jax.random.split(rng, L)
    x, _ = jax.lax.scan(level_body, x_init, (jnp.arange(L), keys))
    if denoise:
        t_b = jnp.full((B,), L - 1, jnp.float32)
        x = x + sigmas[-1] ** 2 * (-scorenet_apply(variables, x, t_b, condition, None) / sigmas[-1])
    return x


def sparse_anneal_langevin_dynamics(
    scorenet_apply,
    variables,
    rng,
    x_init: Array,
    sparsity: Array,
    condition: Array,
    sigmas: Array,
    n_steps_each: int = 1,
    step_lr: float = 8e-6,
    denoise: bool = True,
    frac_steps: Optional[float] = None,
) -> Array:
    """Sparse annealed Langevin (ref ``sparse_anneal_Langevin_dynamics
    :517-621``): a dense chain ``x`` drives the scorenet while the sparse
    chain gets grad/sparsity and noise*sparsity updates. The scorenet output
    is the z-prediction (ref update ``x - step/sigma * z``)."""
    B = x_init.shape[0]
    sigmas_np = np.asarray(sigmas, np.float64)
    if frac_steps is not None:
        sigmas_np = sigmas_np[int((1 - frac_steps) * len(sigmas_np)):]
    L = len(sigmas_np)
    sigmas = jnp.asarray(sigmas_np, jnp.float32)
    sparsity = jnp.asarray(sparsity, jnp.float32)

    def level_body(carry, inp):
        x, x_sparse = carry
        c, key = inp
        sigma = sigmas[c]
        step_size = step_lr * (sigma / sigmas[-1]) ** 2

        def step_body(carry, k):
            x, x_sparse = carry
            t_b = jnp.full((B,), c, jnp.float32)
            grad = scorenet_apply(variables, x, t_b, condition, None)
            noise = jax.random.normal(k, x.shape)
            x = x - step_size / sigma * grad + jnp.sqrt(2.0 * step_size) * noise
            x_sparse = (
                x_sparse
                - step_size / sigma * (grad / sparsity)
                + jnp.sqrt(2.0 * step_size) * (sparsity * noise)
            )
            return (x, x_sparse), None

        keys = jax.random.split(key, n_steps_each)
        carry, _ = jax.lax.scan(step_body, (x, x_sparse), keys)
        return carry, None

    keys = jax.random.split(rng, L)
    (x, x_sparse), _ = jax.lax.scan(level_body, (x_init, jnp.array(x_init)), (jnp.arange(L), keys))
    if denoise:
        t_b = jnp.full((B,), L - 1, jnp.float32)
        x_sparse = x_sparse - sigmas[-1] * sparsity * scorenet_apply(variables, x, t_b, condition, None)
    return x_sparse


def anneal_langevin_dynamics_consistent(
    scorenet_apply,
    variables,
    rng,
    x_init: Array,
    condition: Array,
    sigmas: Array,
    n_steps_each: int = 1,
    step_lr: float = 8e-6,
    denoise: bool = True,
) -> Array:
    """Consistent annealed sampling (CAS; ref
    ``anneal_Langevin_dynamics_consistent :622-737``): a geometric sigma
    ladder of (L-1)*n_steps+1 levels; per level
    ``x -= eta * sigma_c * z`` then ``x += beta * sigma_next * noise`` with
    ``beta = sqrt(1 - (gamma (1-eta))^2)``. The scorenet is conditioned on the
    CONTINUOUS sigma value (passed as the time argument; ref
    ``y_is_label=False``)."""
    B = x_init.shape[0]
    sigmas_np = np.asarray(sigmas, np.float64)
    L = len(sigmas_np)
    ladder = np.geomspace(sigmas_np[0], sigmas_np[-1], (L - 1) * n_steps_each + 1)
    smallest_invgamma = ladder[-1] / ladder[-2]
    lowerbound = sigmas_np[-1] ** 2 * (1 - smallest_invgamma)
    higherbound = sigmas_np[-1] ** 2 * (1 + smallest_invgamma)
    assert lowerbound < step_lr < higherbound, (
        f"consistent sampling needs {lowerbound} < step_lr < {higherbound}, got {step_lr}"
    )
    eta = step_lr / float(sigmas_np[-1] ** 2)
    # per-level (sigma_c, sigma_next, gamma); last level keeps x unchanged
    sig_c = ladder
    sig_next = np.concatenate([ladder[1:], [ladder[-1]]])
    gamma = sig_c / sig_next
    beta = np.sqrt(np.clip(1.0 - (gamma * (1.0 - eta)) ** 2, 0.0, None))
    n = len(ladder)

    xs = (
        jnp.asarray(sig_c, jnp.float32),
        jnp.asarray(sig_next, jnp.float32),
        jnp.asarray(beta, jnp.float32),
        jnp.arange(n),
    )

    def body(x, inp):
        s_c, s_next, b, i = inp
        t_b = jnp.full((B,), s_c)  # continuous sigma conditioning
        grad = scorenet_apply(variables, x, t_b, condition, None)
        x = x - eta * s_c * grad
        noise = jax.random.normal(jax.random.fold_in(rng, i), x.shape)
        x = jnp.where(i + 1 < n, x + b * s_next * noise, x)  # no noise at last level
        return x, None

    x, _ = jax.lax.scan(body, x_init, xs)
    if denoise:
        # ref :694-697: the final denoise conditions on the integer label
        # len(sigmas)-1 (y_is_label=True there), NOT the continuous sigma
        t_b = jnp.full((B,), L - 1, jnp.float32)
        x = x - sigmas_np[-1] * scorenet_apply(variables, x, t_b, condition, None)
    return x


def sparse_anneal_langevin_dynamics_consistent(
    scorenet_apply,
    variables,
    rng,
    x_init: Array,
    sparsity: Array,
    condition: Array,
    sigmas: Array,
    n_steps_each: int = 1,
    step_lr: float = 8e-6,
    denoise: bool = True,
) -> Array:
    """Sparse variant of CAS (ref ``sparse_anneal_Langevin_dynamics_consistent
    :738-857``), transcribed LITERALLY — and the upstream semantics are odd:
    the dense chain is updated with ``x += eta*sigma_c**2 * grad`` (sign and
    sigma power differ from dense CAS, ref :805), the SPARSE chain receives
    only the scaled noise during the loop (never the score, ref :829-830),
    and the final denoise runs the scorenet twice — once to denoise the dense
    chain, then again on the DENOISED dense chain to update the sparse one
    with ``+ sigmas[-1]/sparsity`` (ref :812-815). Preserved as documented
    parity with the reference's unreachable-from-config sampler library."""
    B = x_init.shape[0]
    sigmas_np = np.asarray(sigmas, np.float64)
    L = len(sigmas_np)
    ladder = np.geomspace(sigmas_np[0], sigmas_np[-1], (L - 1) * n_steps_each + 1)
    smallest_invgamma = ladder[-1] / ladder[-2]
    lowerbound = sigmas_np[-1] ** 2 * (1 - smallest_invgamma)
    higherbound = sigmas_np[-1] ** 2 * (1 + smallest_invgamma)
    assert lowerbound < step_lr < higherbound, (
        f"consistent sampling needs {lowerbound} < step_lr < {higherbound}, got {step_lr}"
    )
    eta = step_lr / float(sigmas_np[-1] ** 2)
    sig_c = ladder
    sig_next = np.concatenate([ladder[1:], [ladder[-1]]])
    gamma = sig_c / sig_next
    beta = np.sqrt(np.clip(1.0 - (gamma * (1.0 - eta)) ** 2, 0.0, None))
    n = len(ladder)
    sparsity = jnp.asarray(sparsity, jnp.float32)

    xs = (
        jnp.asarray(sig_c, jnp.float32),
        jnp.asarray(sig_next, jnp.float32),
        jnp.asarray(beta, jnp.float32),
        jnp.arange(n),
    )

    def body(carry, inp):
        x, x_sparse = carry
        s_c, s_next, b, i = inp
        t_b = jnp.full((B,), s_c)  # continuous sigma conditioning (ref :794-800)
        grad = scorenet_apply(variables, x, t_b, condition, None)
        noise = jax.random.normal(jax.random.fold_in(rng, i), x.shape)
        keep = i + 1 < n
        x_new = x + eta * s_c**2 * grad + jnp.where(keep, s_next * b, 0.0) * noise
        x_sparse_new = x_sparse + jnp.where(keep, s_next * b, 0.0) * (sparsity * noise)
        return (x_new, x_sparse_new), None

    (x, x_sparse), _ = jax.lax.scan(body, (x_init, jnp.array(x_init)), xs)
    if denoise:
        t_b = jnp.full((B,), L - 1, jnp.float32)  # integer label (ref :812)
        x_den = x + sigmas_np[-1] * scorenet_apply(variables, x, t_b, condition, None)
        x_sparse = x_sparse + sigmas_np[-1] / sparsity * scorenet_apply(
            variables, x_den, t_b, condition, None
        )
    return x_sparse


def anneal_langevin_dynamics_inpainting(
    scorenet_apply,
    variables,
    rng,
    x_init: Array,
    refer_image: Array,
    known_mask: Array,
    condition: Array,
    sigmas: Array,
    n_steps_each: int = 1,
    step_lr: float = 8e-6,
) -> Array:
    """Langevin inpainting (ref ``anneal_Langevin_dynamics_inpainting
    :858-899``, generalized from the hardcoded right-half-missing 32x32 case
    to an arbitrary known-pixel mask): per step, the KNOWN region is replaced
    by the reference image re-corrupted to the current noise level, then a
    Langevin update runs on the whole tensor. The scorenet output is used as
    the score directly (ref update ``x + step_size * grad``)."""
    B = x_init.shape[0]
    L = len(sigmas)
    sigmas = jnp.asarray(sigmas, jnp.float32)
    known_mask = jnp.asarray(known_mask, x_init.dtype)

    def level_body(x, inp):
        c, key = inp
        sigma = sigmas[c]
        step_size = step_lr * (sigma / sigmas[-1]) ** 2

        def step_body(x, k):
            k_corrupt, k_noise = jax.random.split(k)
            corrupted = refer_image + jax.random.normal(k_corrupt, refer_image.shape) * sigma
            x = known_mask * corrupted + (1.0 - known_mask) * x
            t_b = jnp.full((B,), c, jnp.float32)
            grad = scorenet_apply(variables, x, t_b, condition, None)
            noise = jax.random.normal(k_noise, x.shape) * jnp.sqrt(2.0 * step_size)
            return x + step_size * grad + noise, None

        keys = jax.random.split(key, n_steps_each)
        x, _ = jax.lax.scan(step_body, x, keys)
        return x, None

    keys = jax.random.split(rng, L)
    x, _ = jax.lax.scan(level_body, x_init, (jnp.arange(L), keys))
    return x


def anneal_langevin_dynamics_interpolation(
    scorenet_apply,
    variables,
    rng,
    x_init: Array,
    n_interpolations: int,
    condition: Array,
    sigmas: Array,
    n_steps_each: int = 1,
    step_lr: float = 8e-6,
) -> Array:
    """Langevin interpolation (ref ``anneal_Langevin_dynamics_interpolation
    :902-976``): each of the B rows runs ``n_interpolations`` chains whose
    per-step noise is a spherical interpolation
    ``cos(angle) * noise_p + sin(angle) * noise_q`` between two shared draws —
    neighboring chains share correlated randomness and land on an
    interpolation path. Returns (B * n_interpolations, *sample_shape)."""
    B = x_init.shape[0]
    L = len(sigmas)
    sigmas = jnp.asarray(sigmas, jnp.float32)
    x = jnp.repeat(x_init, n_interpolations, axis=0)  # row-major (B, n_i) flatten
    angles = jnp.linspace(0.0, jnp.pi / 2.0, n_interpolations)
    ang_shape = (1, n_interpolations) + (1,) * (x_init.ndim - 1)
    cos_a = jnp.cos(angles).reshape(ang_shape)
    sin_a = jnp.sin(angles).reshape(ang_shape)

    def level_body(x, inp):
        c, key = inp
        sigma = sigmas[c]
        step_size = step_lr * (sigma / sigmas[-1]) ** 2

        def step_body(x, k):
            k_p, k_q = jax.random.split(k)
            noise_p = jax.random.normal(k_p, x_init.shape)[:, None]
            noise_q = jax.random.normal(k_q, x_init.shape)[:, None]
            noise = (noise_p * cos_a + noise_q * sin_a).reshape(x.shape)
            t_b = jnp.full((x.shape[0],), c, jnp.float32)
            grad = scorenet_apply(variables, x, t_b, condition, None)
            return x + step_size * grad + noise * jnp.sqrt(2.0 * step_size), None

        keys = jax.random.split(key, n_steps_each)
        x, _ = jax.lax.scan(step_body, x, keys)
        return x, None

    keys = jax.random.split(rng, L)
    x, _ = jax.lax.scan(level_body, x, (jnp.arange(L), keys))
    return x
