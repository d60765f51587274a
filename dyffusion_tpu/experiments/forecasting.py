"""Multi-horizon forecasting experiments.

Capability parity with ``src/experiment_types/forecasting_multi_horizon.py``:

- :class:`DyffusionForecastingExperiment` — stage-2 DYffusion (ref ``:398-424``):
  diffusion timesteps == horizon, window frames as conditioning, loss on the
  last frame via the engine's two-term ``p_losses``; evaluation runs the full
  cold sampler and returns every dynamical step's prediction.
- :class:`TimeConditionedForecastingExperiment` — the time-conditioned ("dropout")
  baseline (ref ``:427-457``): random t in [1, h] passed as model time input.
- :class:`SimultaneousForecastingExperiment` — predict all h frames at once,
  stacked on channels (ref ``:460-511``); hosts the standard-diffusion
  baselines when built with a Gaussian-diffusion engine.

All support the autoregressive outer rollout (ref ``_evaluation_step
:114-229``): eval chains ceil(prediction_horizon / horizon) sampler windows,
each ensemble member continuing its own trajectory, with the datamodule's
boundary-condition hook applied per step.

TPU-first: the ensemble axis is a vmap, AR windows are a short Python loop of
jitted sampler calls (each itself a lax.scan), and per-t baseline predictions
are batched into one forward.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from dyffusion_tpu.experiments.base import Experiment, stack_window
from dyffusion_tpu.utils.loss import get_loss_fn

Array = jnp.ndarray


class ForecastingExperiment(Experiment):
    """Shared multi-horizon machinery (ref ``AbstractMultiHorizonForecastingExperiment``)."""

    def __init__(self, cfg, dims, model=None, boundary_fn=None):
        super().__init__(cfg, dims)
        self.model = model
        self.criterion = get_loss_fn(cfg.loss_function)
        # datamodule hook re-imposing physics boundary conditions on
        # predictions (ref ``_evaluation_step :175-182``); jittable:
        # (preds, metadata, time) -> preds
        self.boundary_fn = boundary_fn

    def apply_boundary(self, preds: Array, batch: Dict[str, Array], total_horizon: float) -> Array:
        if self.boundary_fn is None:
            return preds
        t0 = batch.get("metadata_t0")
        dt = batch.get("metadata_dt")
        time = None if t0 is None else t0 + (dt if dt is not None else 1.0) * total_horizon
        return self.boundary_fn(preds, metadata=batch, time=time)

    @property
    def horizon_range(self):
        return list(range(1, self.cfg.horizon + 1))  # 1..h (ref :47-48)

    @property
    def num_autoregressive_steps(self) -> int:
        """ceil(prediction_horizon / horizon) - 1 (ref :71-76)."""
        ph = self.cfg.prediction_horizon
        if not ph:
            return 0
        return max(1, -(-ph // self.cfg.horizon)) - 1

    @property
    def default_monitor(self) -> str:
        if self.cfg.num_predictions > 1:
            return "val/crps"
        return "val/avg/mse"

    def record_window(self, out: Dict[str, Array], preds: Array, batch: Dict[str, Array], ar: int, dynamics: Array) -> Array:
        """Record one sampling window's per-t predictions (with boundary
        conditions applied) and targets into ``out``; returns the
        boundary-adjusted (N, B, h, ...) predictions (the reference also
        chains AR windows from the adjusted predictions, ``:175-197``)."""
        h, w = self.cfg.horizon, self.cfg.window
        adjusted = []
        for i in self.horizon_range:
            total = ar * h + i
            p = self.apply_boundary(preds[:, :, i - 1], batch, float(total))
            adjusted.append(p)
            out[f"t{total}_preds"] = p
            t_idx = w + total - 1
            if t_idx < dynamics.shape[1]:
                out[f"t{total}_targets"] = dynamics[:, t_idx]
        return jnp.stack(adjusted, axis=2)

    def next_window_inputs(self, preds: Array) -> Array:
        """Last `window` integer-step predictions -> next stacked inputs
        (ref ``:194-221``). preds: (..., h, H, W, C) -> (..., H, W, w*C)."""
        w = self.cfg.window
        tail = preds[..., -w:, :, :, :]
        tail = jnp.moveaxis(tail, -4, -2)  # (..., H, W, w, C)
        return tail.reshape(tail.shape[:-2] + (w * tail.shape[-1],))


class DyffusionForecastingExperiment(ForecastingExperiment):
    """Stage-2 DYffusion training + sampling (ref ``:398-424``)."""

    def __init__(
        self, cfg, dims, model=None, engine=None, interpolator_params=None,
        boundary_fn=None, forward_conditioning: str = "data",
    ):
        super().__init__(cfg, dims, model, boundary_fn=boundary_fn)
        self.engine = engine  # DyffusionEngine over forecaster+interpolator applies
        self.interpolator_params = interpolator_params  # frozen variables
        # channel arithmetic must know the conditioning mode BEFORE the engine
        # exists (the engine needs the built backbone) — an explicit arg, not
        # a peek at the not-yet-set engine
        self.forward_conditioning = forward_conditioning

    # forecaster input is a single frame (window used as conditioning; ref :84-95)
    def actual_num_input_channels(self) -> int:
        return self.dims["input"]

    def num_conditional_channels(self) -> int:
        base = self.dims.get("conditional", 0)
        if self.forward_conditioning == "none":
            # ref predict_x_last :205-239: no data conditioning, statics only
            return base
        return base + self.dims["input"] * self.cfg.window

    def make_loss_fn(self, train_apply=None) -> Callable:
        """Engine two-term loss; condition = stacked window, target = last
        frame (ref ``get_loss :412-420``)."""
        engine = self.engine

        def loss_fn(variables, batch, rng):
            dynamics = batch["dynamics"]
            x_last = dynamics[:, -1]
            condition = stack_window(dynamics, self.cfg.window)
            loss, aux = engine.loss(
                variables,
                self.interpolator_params,
                rng,
                xt_last=x_last,
                condition=condition,
                static_condition=self.static_condition(batch),
            )
            updates = aux.pop("_model_state_updates", {})
            return loss, (aux, updates)

        return loss_fn

    def make_eval_fn(self, apply_fn=None, split: str = "val", autoregressive: bool = False) -> Callable:
        """Full sampler + ensemble; optional AR chaining over
        ceil(prediction_horizon/h) windows.

        Two ensemble layouts (``ExperimentConfig.fold_members_into_batch``):
        a vmap over member rng keys (the default), or members folded into the
        batch axis — one (N*B)-batch sampler call, ~1.8x faster at SST scale
        (the round-1 bench path, now the product path). ``eval_dtype`` casts
        the sampler compute (params + inputs) to bf16; predictions are cast
        back to f32 before boundary conditions and metrics.
        """
        engine = self.engine
        h = self.cfg.horizon
        n_members = self.num_members(split)
        noise = self.cfg.prediction_inputs_noise
        n_windows = (self.num_autoregressive_steps + 1) if autoregressive else 1
        fold = self.cfg.fold_members_into_batch
        dtype = jnp.bfloat16 if self.cfg.eval_dtype in ("bfloat16", "bf16") else None

        def _tile(x):  # (B, ...) -> (N*B, ...)
            return jnp.broadcast_to(x[None], (n_members,) + x.shape).reshape(
                (n_members * x.shape[0],) + x.shape[1:]
            )

        def eval_fn(variables, batch, rng):
            dynamics = batch["dynamics"]
            w = self.cfg.window
            condition0 = stack_window(dynamics, w)
            static_cond = self.static_condition(batch)
            ip_params = self.interpolator_params
            if dtype is not None:
                cast = lambda t: jax.tree_util.tree_map(lambda x: x.astype(dtype), t)
                variables, ip_params = cast(variables), cast(ip_params)
                condition0 = condition0.astype(dtype)
                static_cond = None if static_cond is None else static_cond.astype(dtype)

            out = {}

            if fold:
                B = condition0.shape[0]
                cond_flat = _tile(condition0)
                sc_flat = None if static_cond is None else _tile(static_cond)
                key = rng
                if noise > 0:
                    k_n, key = jax.random.split(key)
                    cond_flat = cond_flat + noise * jax.random.normal(
                        k_n, cond_flat.shape, cond_flat.dtype
                    )
                preds = engine.sample(variables, ip_params, key, cond_flat, sc_flat)
                preds = preds.reshape((n_members, B) + preds.shape[1:]).astype(jnp.float32)
                preds = self.record_window(out, preds, batch, 0, dynamics)
                for ar in range(1, n_windows):
                    ar_inputs = self.next_window_inputs(preds)  # (N, B, H, W, w*C)
                    ar_flat = ar_inputs.reshape((n_members * B,) + ar_inputs.shape[2:])
                    if dtype is not None:
                        ar_flat = ar_flat.astype(dtype)
                    preds = engine.sample(
                        variables, ip_params, jax.random.fold_in(rng, ar), ar_flat, sc_flat
                    )
                    preds = preds.reshape((n_members, B) + preds.shape[1:]).astype(jnp.float32)
                    preds = self.record_window(out, preds, batch, ar, dynamics)
                return out

            member_keys = jax.random.split(rng, n_members)

            def first_window(key):
                if noise > 0:
                    k_n, key = jax.random.split(key)
                    cond = condition0 + noise * jax.random.normal(
                        k_n, condition0.shape, condition0.dtype
                    )
                else:
                    cond = condition0
                return engine.sample(variables, ip_params, key, cond, static_cond)

            preds = jax.vmap(first_window)(member_keys)  # (N, B, h, H, W, C)
            preds = preds.astype(jnp.float32)
            preds = self.record_window(out, preds, batch, 0, dynamics)

            # autoregressive continuation: each member continues its own
            # trajectory (ref :163 ``num_predictions=1`` after first window)
            for ar in range(1, n_windows):
                ar_inputs = self.next_window_inputs(preds)  # (N, B, H, W, w*C)
                if dtype is not None:
                    ar_inputs = ar_inputs.astype(dtype)
                member_keys = jax.vmap(lambda k: jax.random.fold_in(k, ar))(member_keys)
                preds = jax.vmap(lambda k, c: engine.sample(
                    variables, ip_params, k, c, static_cond
                ))(member_keys, ar_inputs)
                preds = preds.astype(jnp.float32)
                preds = self.record_window(out, preds, batch, ar, dynamics)
            return out

        return eval_fn


class TimeConditionedForecastingExperiment(ForecastingExperiment):
    """Time-conditioned direct forecasting baseline (ref ``:427-457``)."""

    def actual_num_input_channels(self) -> int:
        return self.dims["input"] * self.cfg.window

    def make_loss_fn(self, train_apply) -> Callable:
        w, h = self.cfg.window, self.cfg.horizon

        def loss_fn(variables, batch, rng):
            dynamics = batch["dynamics"]
            B = dynamics.shape[0]
            k_t, k_drop = jax.random.split(rng)
            t = jax.random.randint(k_t, (B,), 1, h + 1)  # [1, h] (ref :439)
            inputs = stack_window(dynamics, w)
            targets = jnp.take_along_axis(
                dynamics, (w + t - 1)[:, None, None, None, None], axis=1
            ).squeeze(1)
            preds, updates = train_apply(
                variables, inputs, t.astype(jnp.float32), self.static_condition(batch), k_drop
            )
            loss = self.criterion(preds, targets)
            return loss, ({"loss": loss}, updates)

        return loss_fn

    def make_eval_fn(self, apply_fn, split: str = "val", autoregressive: bool = False) -> Callable:
        w, h = self.cfg.window, self.cfg.horizon
        n_members = self.num_members(split)
        noise = self.cfg.prediction_inputs_noise
        use_dropout = self.cfg.enable_inference_dropout
        n_windows = (self.num_autoregressive_steps + 1) if autoregressive else 1

        def eval_fn(variables, batch, rng):
            dynamics = batch["dynamics"]
            B = dynamics.shape[0]
            inputs0 = stack_window(dynamics, w)
            cond = self.static_condition(batch)
            times = jnp.arange(1, h + 1, dtype=jnp.float32)

            def window_preds(key, inputs):
                k_noise, k_drop = jax.random.split(key)
                if noise > 0:
                    inputs = inputs + noise * jax.random.normal(k_noise, inputs.shape, inputs.dtype)

                # scan over horizon times at batch B (memory-safe for big
                # backbones; see interpolation.py note)
                def at_time(c, t_and_i):
                    t_val, i = t_and_i
                    t_b = jnp.full((B,), t_val)
                    p = apply_fn(
                        variables, inputs, t_b, cond,
                        jax.random.fold_in(k_drop, i) if use_dropout else None,
                    )
                    return c, p

                _, p = jax.lax.scan(at_time, 0, (times, jnp.arange(h)))
                return jnp.moveaxis(p, 0, 1)  # (B, h, ...)

            member_keys = jax.random.split(rng, n_members)
            preds = jax.vmap(lambda k: window_preds(k, inputs0))(member_keys)  # (N, B, h, ...)
            out = {}
            preds = self.record_window(out, preds, batch, 0, dynamics)
            for ar in range(1, n_windows):
                ar_inputs = self.next_window_inputs(preds)
                member_keys = jax.vmap(lambda k: jax.random.fold_in(k, ar))(member_keys)
                preds = jax.vmap(window_preds)(member_keys, ar_inputs)
                preds = self.record_window(out, preds, batch, ar, dynamics)
            return out

        return eval_fn


class SimultaneousForecastingExperiment(ForecastingExperiment):
    """Predict all h frames at once, stacked on channels (ref ``:460-511``).
    With ``diffusion_engine`` set, hosts the DDPM/MCVD-style baselines whose
    sampler produces the full stacked-horizon tensor at once."""

    def __init__(self, cfg, dims, model=None, diffusion_engine=None, boundary_fn=None, is_diffusion=None):
        super().__init__(cfg, dims, model, boundary_fn=boundary_fn)
        self.diffusion_engine = diffusion_engine
        # channel arithmetic depends on diffusion-hosting BEFORE the engine
        # exists (the engine needs the built backbone): an explicit flag, not
        # a placeholder engine value
        self.is_diffusion = bool(is_diffusion) if is_diffusion is not None else diffusion_engine is not None

    @staticmethod
    def _split_logvar(variables):
        """Pop the learnable per-timestep logvar (LDM-DDPM, ref ddpm.py:89-92)
        off the params tree so the denoiser apply sees only model params."""
        params = variables.get("params", {})
        if "_diffusion_logvar" not in params:
            return variables, None
        params = dict(params)
        logvar = params.pop("_diffusion_logvar")
        return {**variables, "params": params}, logvar

    def actual_num_input_channels(self) -> int:
        if self.is_diffusion:
            # standard diffusion: model input is output-shaped (ref :87-90)
            return self.actual_num_output_channels()
        return self.dims["input"] * self.cfg.window

    def actual_num_output_channels(self) -> int:
        return self.dims["output"] * self.cfg.horizon  # (ref :469-473)

    def num_conditional_channels(self) -> int:
        base = self.dims.get("conditional", 0)
        if self.is_diffusion:
            # window frames condition the denoiser
            return base + self.dims["input"] * self.cfg.window
        return base

    def _unstack(self, preds: Array) -> Array:
        """(..., H, W, h*C) -> (..., h, H, W, C) (ref ``reshape_predictions
        :487-499``; channels-last unstack, time-major)."""
        h = self.cfg.horizon
        C = self.dims["output"]
        out = preds.reshape(preds.shape[:-1] + (h, C))  # (..., H, W, h, C)
        return jnp.moveaxis(out, -2, -4)

    def make_loss_fn(self, train_apply) -> Callable:
        w, h = self.cfg.window, self.cfg.horizon

        def loss_fn(variables, batch, rng):
            dynamics = batch["dynamics"]
            inputs = stack_window(dynamics, w)
            # targets: frames w..w+h-1 stacked on channels (ref :480-482)
            tgt = dynamics[:, w : w + h]
            B, _, H, W, C = tgt.shape
            targets = jnp.moveaxis(tgt, 1, -2).reshape(B, H, W, h * C)
            if self.diffusion_engine is not None:
                cond = inputs
                sc = self.static_condition(batch)
                if sc is not None:
                    cond = jnp.concatenate([cond, sc], axis=-1)
                variables, logvar = self._split_logvar(variables)
                if logvar is not None:
                    loss, aux = self.diffusion_engine.loss(variables, rng, targets, cond, logvar=logvar)
                else:
                    loss, aux = self.diffusion_engine.loss(variables, rng, targets, cond)
                return loss, (aux, {})
            k_drop, _ = jax.random.split(rng)
            preds, updates = train_apply(variables, inputs, None, self.static_condition(batch), k_drop)
            loss = self.criterion(preds, targets)
            return loss, ({"loss": loss}, updates)

        return loss_fn

    def make_eval_fn(self, apply_fn, split: str = "val", autoregressive: bool = False) -> Callable:
        w, h = self.cfg.window, self.cfg.horizon
        n_members = self.num_members(split)
        noise = self.cfg.prediction_inputs_noise
        use_dropout = self.cfg.enable_inference_dropout
        n_windows = (self.num_autoregressive_steps + 1) if autoregressive else 1

        def eval_fn(variables, batch, rng):
            variables, _ = self._split_logvar(variables)  # logvar is train-only
            dynamics = batch["dynamics"]
            inputs0 = stack_window(dynamics, w)
            sc = self.static_condition(batch)

            def window_preds(key, inputs):
                k_noise, k_drop = jax.random.split(key)
                x = inputs
                if noise > 0:
                    x = x + noise * jax.random.normal(k_noise, x.shape, x.dtype)
                if self.diffusion_engine is not None:
                    cond = x if sc is None else jnp.concatenate([x, sc], axis=-1)
                    p = self.diffusion_engine.sample(variables, k_drop, cond)
                else:
                    p = apply_fn(variables, x, None, sc, k_drop if use_dropout else None)
                return self._unstack(p)  # (B, h, H, W, C)

            member_keys = jax.random.split(rng, n_members)
            preds = jax.vmap(lambda k: window_preds(k, inputs0))(member_keys)
            out = {}
            preds = self.record_window(out, preds, batch, 0, dynamics)
            for ar in range(1, n_windows):
                ar_inputs = self.next_window_inputs(preds)
                member_keys = jax.vmap(lambda k: jax.random.fold_in(k, ar))(member_keys)
                preds = jax.vmap(window_preds)(member_keys, ar_inputs)
                preds = self.record_window(out, preds, batch, ar, dynamics)
            return out

        return eval_fn
