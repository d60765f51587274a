"""RefineNet block zoo (NCSNv1/v2 decoder components), TPU-native.

Capability parity with ``src/models/mcvd/layers.py:125-345``: chained
residual pooling (``CRPBlock``), residual conv units (``RCUBlock``),
multi-scale fusion (``MSFBlock``) and the full ``RefineBlock`` composition,
plus their class-conditional variants (``Cond*``) which interleave a
conditional normalizer (e.g. ConditionalInstanceNorm2dPlus from
``dyffusion_tpu.models.normalization``). NHWC layout.

TPU notes: the 5x5 stride-1 pools are ``lax.reduce_window`` ops; the
multi-scale fusion's align-corners bilinear resize is implemented as TWO
separable interpolation MATMULS (MXU-friendly; ``jax.image.resize`` has no
align_corners=True mode and gathers instead).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jnp.ndarray


def _ncsn_conv3x3(features: int, use_bias: bool, name: str):
    """ncsn_conv3x3 (ref ``layers.py:99-107``): 3x3 pad-1 conv with the torch
    default (kaiming-uniform) init — flax's lecun_normal is the closest
    variance match; init_scale=1 so no extra scaling."""
    return nn.Conv(
        features, (3, 3), padding=((1, 1), (1, 1)), use_bias=use_bias, name=name
    )


def _pool5(x: Array, kind: str) -> Array:
    """5x5 stride-1 pad-2 max/avg pool (ref CRPBlock ctor)."""
    if kind == "max":
        return nn.max_pool(x, (5, 5), strides=(1, 1), padding=((2, 2), (2, 2)))
    return nn.avg_pool(x, (5, 5), strides=(1, 1), padding=((2, 2), (2, 2)), count_include_pad=False)


def _avg_pool5_torch(x: Array) -> Array:
    """torch AvgPool2d(5,1,2) counts zero padding in the divisor
    (count_include_pad=True, the torch default)."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 5, 5, 1), (1, 1, 1, 1),
        [(0, 0), (2, 2), (2, 2), (0, 0)],
    )
    return summed / 25.0


def resize_bilinear_align_corners(x: Array, shape: Tuple[int, int]) -> Array:
    """Bilinear resize with align_corners=True semantics (torch
    ``F.interpolate(..., align_corners=True)``), as two separable
    interpolation matmuls over H then W — each a clean MXU contraction."""
    B, H, W, C = x.shape
    out_h, out_w = shape

    def weights(n_in: int, n_out: int) -> np.ndarray:
        if n_out == 1 or n_in == 1:
            w = np.zeros((n_out, n_in), np.float32)
            w[:, 0] = 1.0
            return w
        pos = np.linspace(0.0, n_in - 1.0, n_out)
        lo = np.clip(np.floor(pos).astype(int), 0, n_in - 1)
        hi = np.clip(lo + 1, 0, n_in - 1)
        frac = (pos - lo).astype(np.float32)
        w = np.zeros((n_out, n_in), np.float32)
        w[np.arange(n_out), lo] += 1.0 - frac
        w[np.arange(n_out), hi] += frac
        return w

    wh = jnp.asarray(weights(H, out_h), x.dtype)
    ww = jnp.asarray(weights(W, out_w), x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", wh, x)  # (B, out_h, W, C)
    return jnp.einsum("ow,bhwc->bhoc", ww, x)  # (B, out_h, out_w, C)


class CRPBlock(nn.Module):
    """Chained residual pooling (ref ``layers.py:125-147``)."""

    features: int
    n_stages: int = 2
    maxpool: bool = True
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = self.act(x)
        path = x
        for i in range(self.n_stages):
            path = _pool5(path, "max") if self.maxpool else _avg_pool5_torch(path)
            path = _ncsn_conv3x3(self.features, use_bias=False, name=f"conv{i}")(path)
            x = path + x
        return x


class CondCRPBlock(nn.Module):
    """Conditional CRP (ref ``:149-172``): normalizer before each pool."""

    features: int
    n_stages: int
    num_classes: int
    normalizer: Callable  # class: (features, num_classes, bias=True)
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        x = self.act(x)
        path = x
        for i in range(self.n_stages):
            path = self.normalizer(self.features, self.num_classes, bias=True, name=f"norm{i}")(path, y)
            path = _avg_pool5_torch(path)
            path = _ncsn_conv3x3(self.features, use_bias=False, name=f"conv{i}")(path)
            x = path + x
        return x


class RCUBlock(nn.Module):
    """Residual conv units (ref ``:175-198``)."""

    features: int
    n_blocks: int = 2
    n_stages: int = 2
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.n_blocks):
            residual = x
            for j in range(self.n_stages):
                x = self.act(x)
                x = _ncsn_conv3x3(self.features, use_bias=False, name=f"conv{i}_{j}")(x)
            x = x + residual
        return x


class CondRCUBlock(nn.Module):
    """Conditional RCU (ref ``:201-227``)."""

    features: int
    n_blocks: int
    n_stages: int
    num_classes: int
    normalizer: Callable
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        for i in range(self.n_blocks):
            residual = x
            for j in range(self.n_stages):
                x = self.normalizer(self.features, self.num_classes, bias=True, name=f"norm{i}_{j}")(x, y)
                x = self.act(x)
                x = _ncsn_conv3x3(self.features, use_bias=False, name=f"conv{i}_{j}")(x)
            x = x + residual
        return x


class MSFBlock(nn.Module):
    """Multi-scale fusion (ref ``:230-246``): per-input 3x3 conv, resize to a
    common shape (align-corners bilinear) and sum."""

    features: int

    @nn.compact
    def __call__(self, xs: Sequence[Array], shape: Tuple[int, int]) -> Array:
        out = None
        for i, x in enumerate(xs):
            h = _ncsn_conv3x3(self.features, use_bias=True, name=f"conv{i}")(x)
            h = resize_bilinear_align_corners(h, shape)
            out = h if out is None else out + h
        return out


class CondMSFBlock(nn.Module):
    """Conditional MSF (ref ``:249-273``)."""

    features: int
    num_classes: int
    normalizer: Callable

    @nn.compact
    def __call__(self, xs: Sequence[Array], y: Array, shape: Tuple[int, int]) -> Array:
        out = None
        for i, x in enumerate(xs):
            h = self.normalizer(x.shape[-1], self.num_classes, bias=True, name=f"norm{i}")(x, y)
            h = _ncsn_conv3x3(self.features, use_bias=True, name=f"conv{i}")(h)
            h = resize_bilinear_align_corners(h, shape)
            out = h if out is None else out + h
        return out


class RefineBlock(nn.Module):
    """Full RefineNet block (ref ``:276-308``): per-path RCU adaptation ->
    multi-scale fusion -> chained residual pooling -> output RCU."""

    features: int
    start: bool = False
    end: bool = False
    maxpool: bool = True
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, xs: Sequence[Array], output_shape: Tuple[int, int]) -> Array:
        hs = [
            RCUBlock(x.shape[-1], 2, 2, self.act, name=f"adapt{i}")(x)
            for i, x in enumerate(xs)
        ]
        if len(xs) > 1:
            h = MSFBlock(self.features, name="msf")(hs, output_shape)
        else:
            h = hs[0]
        h = CRPBlock(self.features, 2, self.maxpool, self.act, name="crp")(h)
        return RCUBlock(self.features, 3 if self.end else 1, 2, self.act, name="output")(h)


class CondRefineBlock(nn.Module):
    """Conditional RefineNet block (ref ``:311-345``)."""

    features: int
    num_classes: int
    normalizer: Callable
    start: bool = False
    end: bool = False
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, xs: Sequence[Array], y: Array, output_shape: Tuple[int, int]) -> Array:
        hs = [
            CondRCUBlock(
                x.shape[-1], 2, 2, self.num_classes, self.normalizer, self.act, name=f"adapt{i}"
            )(x, y)
            for i, x in enumerate(xs)
        ]
        if len(xs) > 1:
            h = CondMSFBlock(self.features, self.num_classes, self.normalizer, name="msf")(hs, y, output_shape)
        else:
            h = hs[0]
        h = CondCRPBlock(self.features, 2, self.num_classes, self.normalizer, self.act, name="crp")(h, y)
        return CondRCUBlock(
            self.features, 3 if self.end else 1, 2, self.num_classes, self.normalizer, self.act, name="output"
        )(h, y)
