"""Optimizers and LR schedules.

Capability parity with the reference's optimizer build
(``_base_experiment.py:714-762``: Adam/AdamW with kwargs, step-interval
LambdaLR) and the LDM-style schedules in ``src/utilities/lr_scheduler.py``:

- ``LambdaWarmUpCosineScheduler``  (``lr_scheduler.py:9-38``)
- ``LambdaWarmUpCosineScheduler2`` (multi-cycle, ``:41-83``)
- ``LambdaLinearScheduler``        (``:86-103``)

Expressed as optax schedules (step -> multiplier, applied to a base lr,
mirroring the reference's base-lr-1.0 LambdaLR convention).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax


def warmup_cosine_schedule(
    warm_up_steps: int,
    lr_min: float,
    lr_max: float,
    lr_start: float,
    max_decay_steps: int,
):
    """LambdaWarmUpCosineScheduler (ref ``lr_scheduler.py:9-38``)."""

    def schedule(n):
        n = jnp.asarray(n, jnp.float32)
        warm = (lr_max - lr_start) / warm_up_steps * n + lr_start
        t = jnp.minimum((n - warm_up_steps) / max(max_decay_steps - warm_up_steps, 1), 1.0)
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(n < warm_up_steps, warm, cos)

    return schedule


def _multi_cycle(warm_up_steps, f_min, f_max, f_start, cycle_lengths, linear: bool):
    """Shared core of the multi-cycle schedulers (ref ``lr_scheduler.py:41-103``)."""
    warm_up_steps = list(warm_up_steps)
    f_min, f_max, f_start = list(f_min), list(f_max), list(f_start)
    cycle_lengths = list(cycle_lengths)
    assert len(warm_up_steps) == len(f_min) == len(f_max) == len(f_start) == len(cycle_lengths)
    cum = np.cumsum([0] + cycle_lengths)

    def schedule(n):
        n = jnp.asarray(n, jnp.float32)
        # find_in_interval: n <= cum[i+1] selects cycle i (ref :58-63)
        cycle = jnp.sum((n > jnp.asarray(cum[1:], jnp.float32)).astype(jnp.int32))
        cycle = jnp.minimum(cycle, len(cycle_lengths) - 1)
        cums = jnp.asarray(cum[:-1], jnp.float32)
        wus = jnp.asarray(warm_up_steps, jnp.float32)
        fmins = jnp.asarray(f_min, jnp.float32)
        fmaxs = jnp.asarray(f_max, jnp.float32)
        fstarts = jnp.asarray(f_start, jnp.float32)
        cls = jnp.asarray(cycle_lengths, jnp.float32)
        nn = n - cums[cycle]
        warm = (fmaxs[cycle] - fstarts[cycle]) / wus[cycle] * nn + fstarts[cycle]
        if linear:
            decay = fmins[cycle] + (fmaxs[cycle] - fmins[cycle]) * (cls[cycle] - nn) / cls[cycle]
        else:
            t = jnp.minimum((nn - wus[cycle]) / jnp.maximum(cls[cycle] - wus[cycle], 1.0), 1.0)
            decay = fmins[cycle] + 0.5 * (fmaxs[cycle] - fmins[cycle]) * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(nn < wus[cycle], warm, decay)

    return schedule


def warmup_cosine_schedule2(warm_up_steps, f_min, f_max, f_start, cycle_lengths):
    """LambdaWarmUpCosineScheduler2 (ref ``lr_scheduler.py:41-83``)."""
    return _multi_cycle(warm_up_steps, f_min, f_max, f_start, cycle_lengths, linear=False)


def linear_schedule(warm_up_steps, f_min, f_max, f_start, cycle_lengths):
    """LambdaLinearScheduler (ref ``lr_scheduler.py:86-103``)."""
    return _multi_cycle(warm_up_steps, f_min, f_max, f_start, cycle_lengths, linear=True)


_SCHEDULES = {
    "warmup_cosine": warmup_cosine_schedule,
    "warmup_cosine2": warmup_cosine_schedule2,
    "linear_warmup": linear_schedule,
}


def make_lr_schedule(name: Optional[str] = None, base_lr: float = 1e-3, **kwargs):
    """Build an optax schedule: constant when name is None, else base_lr x
    multiplier(step) (the reference forces base_lr=1.0 into LambdaLR and puts
    the real lr in the multiplier; here base_lr is explicit)."""
    if name is None:
        return optax.constant_schedule(base_lr)
    mult = _SCHEDULES[name](**kwargs)
    return lambda step: base_lr * mult(step)


def build_optimizer(
    name: str = "adamw",
    lr: float = 1e-3,
    weight_decay: float = 1e-5,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    gradient_clip_val: Optional[float] = None,
    scheduler: Optional[dict] = None,
    accumulate_grad_batches: int = 1,
) -> optax.GradientTransformation:
    """Adam/AdamW + optional grad clipping + optional LR schedule
    (ref ``configure_optimizers``, ``_base_experiment.py:714-762``; grad clip
    comes from the trainer config, e.g. ``gradient_clip_val: 1.0``).
    ``accumulate_grad_batches`` wraps the optimizer in optax.MultiSteps — the
    reference's Lightning gradient accumulation (NS uses 2, OISST 4)."""
    if scheduler:
        sched_kwargs = dict(scheduler)
        sched_name = sched_kwargs.pop("name")
        lr_schedule = make_lr_schedule(sched_name, base_lr=lr, **sched_kwargs)
    else:
        lr_schedule = optax.constant_schedule(lr)

    name = name.lower()
    if name == "adamw":
        def _decay_mask(params):
            # NCSNpp's GaussianFourierProjection W is a FIXED random-feature
            # table (the reference stores it as a requires_grad=False buffer,
            # mcvd layerspp.py); its gradient is stop_gradient'ed to zero but
            # decoupled weight decay would still shrink it every step — mask
            # it out of the decay term.
            def keep(path, _):
                return not any(
                    getattr(k, "key", None) == "fourier_emb" for k in path
                )

            return jax.tree_util.tree_map_with_path(keep, params)

        tx = optax.adamw(
            lr_schedule, b1=beta1, b2=beta2, eps=eps,
            weight_decay=weight_decay, mask=_decay_mask,
        )
    elif name == "adam":
        tx = optax.adam(lr_schedule, b1=beta1, b2=beta2, eps=eps)
    elif name == "sgd":
        tx = optax.sgd(lr_schedule)
    else:
        raise ValueError(f"Unknown optimizer: {name}")
    if gradient_clip_val:
        tx = optax.chain(optax.clip_by_global_norm(gradient_clip_val), tx)
    if accumulate_grad_batches and accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_grad_batches)
    return tx
