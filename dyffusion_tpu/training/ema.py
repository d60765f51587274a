"""Exponential moving average of parameters.

Capability parity with the reference's ``LitEma``
(``src/models/modules/ema.py:6-78``): shadow params updated per step with the
warmup decay rule ``decay_t = min(decay, (1 + n) / (10 + n))``. Instead of
module buffers and store/copy_to/restore mode-flipping, the EMA is a pytree
carried in the train state; "evaluate with EMA weights" is simply passing
``state.ema_params`` to the apply-fn.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

Params = Any


def init_ema(params: Params) -> Params:
    """Shadow copy of the trainable params (ref ``ema.py:18-23``).
    Must be a genuine copy: the train step donates the whole state, and
    aliased param/EMA buffers would be donated twice."""
    return jax.tree_util.tree_map(jnp.copy, params)


def ema_update(
    ema_params: Params,
    params: Params,
    num_updates: jnp.ndarray,
    decay: float = 0.9999,
    use_num_updates: bool = True,
) -> Tuple[Params, jnp.ndarray]:
    """One EMA step (ref ``ema.py:27-46``).

    Args:
        num_updates: int32 scalar count BEFORE this update (or -1 to disable
            warmup, matching ``use_num_upates=False``).
    Returns:
        (new_ema_params, new_num_updates)
    """
    if use_num_updates:
        n = num_updates + 1
        d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    else:
        n = num_updates
        d = jnp.asarray(decay)
    one_minus = 1.0 - d
    new_ema = jax.tree_util.tree_map(
        lambda e, p: e - one_minus * (e - p.astype(e.dtype)), ema_params, params
    )
    return new_ema, n
