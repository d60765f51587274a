"""Backbone protocol and apply-fn adapters.

The reference's ``BaseModel`` (``src/models/_base_model.py:19-175``) is a
stateful nn.Module holding channel metadata, a loss fn, and inference-dropout
toggles. Here backbones are flax.linen modules with the uniform signature

    model.apply(variables, x, time=None, condition=None,
                deterministic=..., rngs={'dropout': key})

and the framework passes them around as pure apply-fns of the form
``(params, x, time, condition, dropout_rng) -> prediction``. MC-dropout
("inference dropout", ref ``_base_model.py:148-169``) is simply calling the
apply-fn with a live dropout rng — no module-mode flipping.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray


@dataclass(frozen=True)
class BackboneSpec:
    """Channel/shape metadata a backbone is built with
    (ref ``_base_model.py:42-74`` and ``_base_experiment.py:173-188``)."""

    num_input_channels: int
    num_output_channels: int
    num_conditional_channels: int = 0
    spatial_shape: Tuple[int, int] = (16, 16)
    with_time_emb: bool = True


def concat_condition(x: Array, condition: Optional[Array], num_conditional_channels: int) -> Array:
    """Channel-concat the condition in front of x (ref ``unet.py:266-271``;
    NHWC: concat on the last axis, condition first)."""
    if num_conditional_channels > 0:
        assert condition is not None, "model built with conditional channels but condition is None"
        return jnp.concatenate([condition, x], axis=-1)
    assert condition is None, "condition given but num_conditional_channels == 0"
    return x


def make_apply_fn(model: nn.Module):
    """Wrap a linen backbone into the framework-wide inference apply-fn.

    ``variables`` is the full variable dict ({'params': ..., 'batch_stats'?}).
    ``dropout_rng=None`` => deterministic (dropout off). A live rng enables
    every dropout site — this is how MC-dropout ensembling and the DYffusion
    stochastic interpolator are driven. BatchNorm (if any) always uses running
    stats here, mirroring the reference where MC-dropout flips only Dropout
    modules to train mode (``utils.py:560-574``).
    """

    def apply_fn(variables, x, time=None, condition=None, dropout_rng=None):
        deterministic = dropout_rng is None
        rngs = {} if deterministic else {"dropout": dropout_rng}
        return model.apply(
            variables, x, time=time, condition=condition,
            deterministic=deterministic, train=False, rngs=rngs,
        )

    return apply_fn


def make_train_apply_fn(model: nn.Module, has_batch_stats: bool):
    """Train-mode apply: dropout on, BatchNorm batch-stats mode with mutable
    running-stat updates. Returns ``(out, updates)`` where ``updates`` is a
    dict of updated non-param collections (empty when the model has none)."""

    def apply_fn(variables, x, time=None, condition=None, dropout_rng=None):
        rngs = {} if dropout_rng is None else {"dropout": dropout_rng}
        if has_batch_stats:
            out, updates = model.apply(
                variables, x, time=time, condition=condition,
                deterministic=dropout_rng is None, train=True,
                rngs=rngs, mutable=["batch_stats"],
            )
            return out, dict(updates)
        out = model.apply(
            variables, x, time=time, condition=condition,
            deterministic=dropout_rng is None, train=True, rngs=rngs,
        )
        return out, {}

    return apply_fn


def init_backbone(model: nn.Module, spec: BackboneSpec, rng: jax.Array, batch: int = 1):
    """Initialize backbone variables with example inputs shaped from the spec
    (ref ``example_input_array``, ``unet.py:239-245``). Returns the full
    variables dict ({'params': ..., 'batch_stats'?: ...})."""
    h, w = spec.spatial_shape
    x = jnp.zeros((batch, h, w, spec.num_input_channels), jnp.float32)
    t = jnp.zeros((batch,), jnp.float32) if spec.with_time_emb else None
    cond = (
        jnp.zeros((batch, h, w, spec.num_conditional_channels), jnp.float32)
        if spec.num_conditional_channels > 0
        else None
    )
    # jit the init: eager init dispatches hundreds of tiny initializer ops
    # one-by-one (painfully slow over a remote-TPU tunnel); jitted it is one
    # compiled program.
    init = jax.jit(
        lambda r: model.init({"params": r}, x, time=t, condition=cond, deterministic=True)
    )
    return init(rng)
