"""Loss-function factories.

Capability parity with the reference's loss factory
(``src/utilities/utils.py:136-212`` resolving 'l1'|'l2'/'mse'|'smooth_l1'|...),
re-expressed as pure JAX functions over pytrees of arrays.

Each loss supports an optional boolean/float ``mask`` broadcastable against a
*row mask* over the leading (batch) axis: masked rows contribute zero and the
mean is taken over unmasked rows only. This replaces the reference's
boolean-indexing pattern (``criterion(pred[rows], target[rows])``,
``src/diffusion/dyffusion.py:517-555``) with a static-shape formulation that
XLA can compile once.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

Array = jnp.ndarray
LossFn = Callable[..., Array]


def _masked_mean(per_elem: Array, mask: Optional[Array]) -> Array:
    """Mean of ``per_elem``; if ``mask`` (shape (B,)) is given, average only
    over rows where mask is truthy — exactly equal to ``per_elem[mask].mean()``
    when every row has the same number of elements (always true here)."""
    if mask is None:
        return jnp.mean(per_elem)
    mask = mask.astype(per_elem.dtype)
    # per-row mean, then weighted average over rows
    row_mean = jnp.mean(per_elem.reshape(per_elem.shape[0], -1), axis=-1)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(row_mean * mask) / denom


def _f32(x: Array) -> Array:
    """Loss math always reduces in f32 — under mixed-precision training
    (``module.train_dtype=bfloat16``) preds/targets arrive bf16 and a bf16
    mean over millions of elements would lose the gradient signal; for f32
    inputs this is a no-op."""
    return x.astype(jnp.float32) if jnp.issubdtype(x.dtype, jnp.floating) else x


def mse_loss(preds: Array, targets: Array, mask: Optional[Array] = None) -> Array:
    return _masked_mean((_f32(preds) - _f32(targets)) ** 2, mask)


def l1_loss(preds: Array, targets: Array, mask: Optional[Array] = None) -> Array:
    return _masked_mean(jnp.abs(_f32(preds) - _f32(targets)), mask)


def smooth_l1_loss(preds: Array, targets: Array, mask: Optional[Array] = None, beta: float = 1.0) -> Array:
    d = jnp.abs(_f32(preds) - _f32(targets))
    per_elem = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    return _masked_mean(per_elem, mask)


_LOSSES = {
    "mse": mse_loss,
    "l2": mse_loss,
    "mean_squared_error": mse_loss,
    "l1": l1_loss,
    "mae": l1_loss,
    "mean_absolute_error": l1_loss,
    "smooth_l1": smooth_l1_loss,
    "huber": smooth_l1_loss,
}


def get_loss_fn(name: str) -> LossFn:
    key = name.lower().strip()
    if key not in _LOSSES:
        raise ValueError(f"Unknown loss function '{name}'. Available: {sorted(_LOSSES)}")
    return _LOSSES[key]
