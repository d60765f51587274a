"""Stage-1 interpolation experiment.

Capability parity with ``src/experiment_types/interpolation.py:12-167``:
learn x_i = I(x_0, x_h, i) for i in [1, h-1]. Inputs are the window frames
channel-stacked plus the LAST frame; training samples a random i per row;
evaluation runs an MC-dropout (+input noise) ensemble at EVERY i and tracks
per-i MSE and ensemble CRPS.

TPU-first: evaluation vmaps over (member, i) instead of tiling the batch, and
the per-i loop is a single batched forward of shape (members * (h-1) * B).
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from dyffusion_tpu.experiments.base import Experiment, stack_window
from dyffusion_tpu.utils.loss import get_loss_fn

Array = jnp.ndarray


class InterpolationExperiment(Experiment):
    def __init__(self, cfg, dims, model=None):
        super().__init__(cfg, dims)
        assert cfg.horizon >= 2, "horizon must be >= 2 for interpolation"
        self.model = model  # flax module; set by the interface factory
        self.criterion = get_loss_fn(cfg.loss_function)

    # inputs = window frames + last frame, channel-stacked (ref :48-51)
    def actual_num_input_channels(self) -> int:
        return self.dims["input"] * self.cfg.window + self.dims["input"]

    @property
    def horizon_range(self):
        return list(range(1, self.cfg.horizon))  # 1..h-1 (ref :23-27)

    @property
    def default_monitor(self) -> str:
        if self.cfg.num_predictions > 1:
            return "val/crps"  # auto-CRPS monitor (config_utils.py:188-195)
        return "val/avg/mse"

    def get_inputs(self, dynamics: Array) -> Array:
        """First `window` frames (stacked) + last frame (ref :129-141)."""
        assert dynamics.shape[1] == self.cfg.window + self.cfg.horizon
        past = stack_window(dynamics, self.cfg.window)
        last = dynamics[:, -1]
        return jnp.concatenate([past, last], axis=-1)

    def make_loss_fn(self, train_apply) -> Callable:
        """(variables, batch, rng) -> (loss, (metrics, updates)).
        Random i ~ U{1..h-1} per row; target = dynamics[:, window+i-1]
        (ref ``get_loss :149-167``)."""
        w, h = self.cfg.window, self.cfg.horizon

        def loss_fn(variables, batch, rng):
            dynamics = batch["dynamics"]
            B = dynamics.shape[0]
            k_t, k_drop = jax.random.split(rng)
            t = jax.random.randint(k_t, (B,), 1, h)  # i in [1, h-1]
            inputs = self.get_inputs(dynamics)
            targets = jnp.take_along_axis(
                dynamics, (w + t - 1)[:, None, None, None, None], axis=1
            ).squeeze(1)
            preds, updates = train_apply(
                variables, inputs, t.astype(jnp.float32), self.static_condition(batch), k_drop
            )
            loss = self.criterion(preds, targets)
            return loss, ({"loss": loss}, updates)

        return loss_fn

    def make_eval_fn(self, apply_fn, split: str = "val") -> Callable:
        """(variables, batch, rng) -> {'t{i}_preds': (N,B,H,W,C), 't{i}_targets'}.

        MC-dropout ensemble at every i (ref ``_evaluation_step :68-127``).
        Member layout follows the fast-eval options
        (``ExperimentConfig.fold_members_into_batch`` folds the N members
        into one (N*B)-batch forward per time; ``eval_dtype`` casts the
        compute to bf16 with f32 outputs) — same contract as the
        forecasting experiments.
        """
        w, h = self.cfg.window, self.cfg.horizon
        n_members = self.num_members(split)
        noise = self.cfg.prediction_inputs_noise
        use_dropout = self.cfg.enable_inference_dropout
        fold = self.cfg.fold_members_into_batch
        dtype = jnp.bfloat16 if self.cfg.eval_dtype in ("bfloat16", "bf16") else None

        def eval_fn(variables, batch, rng):
            dynamics = batch["dynamics"]
            B = dynamics.shape[0]
            inputs = self.get_inputs(dynamics)  # (B, H, W, wc+c)
            cond = self.static_condition(batch)
            if dtype is not None:
                variables = jax.tree_util.tree_map(lambda p: p.astype(dtype), variables)
                inputs = inputs.astype(dtype)
                cond = None if cond is None else cond.astype(dtype)
            times = jnp.arange(1, h, dtype=jnp.float32)  # (h-1,)

            if fold:
                # members folded into the batch: one (N*B) forward per time
                x = jnp.broadcast_to(inputs[None], (n_members,) + inputs.shape)
                x = x.reshape((n_members * B,) + inputs.shape[1:])
                c_flat = None
                if cond is not None:
                    c_flat = jnp.broadcast_to(cond[None], (n_members,) + cond.shape)
                    c_flat = c_flat.reshape((n_members * B,) + cond.shape[1:])
                k_noise, k_drop = jax.random.split(rng)
                if noise > 0:
                    x = x + noise * jax.random.normal(k_noise, x.shape, x.dtype)

                def at_time(c, t_and_i):
                    t_val, i = t_and_i
                    t_b = jnp.full((n_members * B,), t_val)
                    p = apply_fn(
                        variables, x, t_b, c_flat,
                        jax.random.fold_in(k_drop, i) if use_dropout else None,
                    )
                    return c, p.astype(jnp.float32)

                _, preds = jax.lax.scan(at_time, 0, (times, jnp.arange(h - 1)))
                preds = preds.reshape((h - 1, n_members, B) + preds.shape[2:])
                preds = jnp.moveaxis(preds, 0, 1)  # (N, n_t, B, ...)
            else:

                def one_member(key):
                    k_noise, k_drop = jax.random.split(key)
                    x = inputs
                    if noise > 0:
                        x = x + noise * jax.random.normal(k_noise, x.shape, x.dtype)

                    # scan over interpolation times at batch B each — tiling
                    # all times into one (n_t*B) forward OOMs on the big
                    # backbones (e.g. NS unet_simple at 256x256, h=16)
                    def at_time(c, t_and_i):
                        t_val, i = t_and_i
                        t_b = jnp.full((B,), t_val)
                        p = apply_fn(
                            variables, x, t_b, cond,
                            jax.random.fold_in(k_drop, i) if use_dropout else None,
                        )
                        return c, p.astype(jnp.float32)

                    _, preds = jax.lax.scan(at_time, 0, (times, jnp.arange(h - 1)))
                    return preds  # (n_t, B, ...)

                member_keys = jax.random.split(rng, n_members)
                preds = jax.vmap(one_member)(member_keys)  # (N, n_t, B, H, W, C)

            out = {}
            for idx, i in enumerate(range(1, h)):
                out[f"t{i}_preds"] = preds[:, idx]
                out[f"t{i}_targets"] = dynamics[:, w + i - 1]
            return out

        return eval_fn
