"""Fused bias + LeakyReLU with gain — the reference's second CUDA op.

The reference JIT-compiles ``fused_bias_act_kernel.cu`` (98 LoC CUDA) with a
custom autograd wrapper (``op/fused_act.py:16-91``). On TPU this is a Pallas
elementwise kernel (VPU) — and because XLA fuses bias+activation into the
producing conv/matmul anyway, the Pallas path exists for the cases where the
op is used standalone; the default entry point lets XLA fuse.

Semantics (ref ``op/fused_act.py:17-19`` CPU fallback):
    out = leaky_relu(x + bias, negative_slope) * scale,  scale = sqrt(2).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def fused_leaky_relu(
    x: Array,
    bias: Optional[Array] = None,
    negative_slope: float = 0.2,
    scale: float = math.sqrt(2.0),
    use_pallas: bool = False,
) -> Array:
    """Bias (broadcast over the channel/last axis) + LeakyReLU * scale."""
    if use_pallas and x.ndim >= 2:
        return _pallas_fused_leaky_relu(x, bias, negative_slope, scale)
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jnp.where(x >= 0, x, negative_slope * x) * scale


@functools.partial(jax.jit, static_argnames=("negative_slope", "scale"))
def _pallas_fused_leaky_relu(x: Array, bias: Optional[Array], negative_slope: float, scale: float) -> Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = x.shape
    C = x.shape[-1]
    x2 = x.reshape(-1, C)
    b = jnp.zeros((C,), x.dtype) if bias is None else bias.astype(x.dtype)
    b2 = jnp.broadcast_to(b, (1, C))

    def kernel(x_ref, b_ref, o_ref):
        v = x_ref[:] + b_ref[:]
        o_ref[:] = jnp.where(v >= 0, v, negative_slope * v) * scale

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",
    )(x2, b2)
    return out.reshape(orig_shape)
