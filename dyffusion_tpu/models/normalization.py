"""NCSN normalization zoo — conditional/unconditional InstanceNorm++,
VarianceNorm, NoneNorm.

Capability parity with ``src/models/mcvd/normalization.py:23-216`` (the
NCSNv1-era layer zoo), re-expressed in flax.linen on NHWC. Notes on exact
semantics preserved from the reference:

- instance statistics are per-(sample, channel) over the spatial dims with
  BIASED variance (torch ``InstanceNorm2d``), eps 1e-5;
- the "++" variants standardize the per-channel MEANS across channels using
  torch.var's default UNBIASED variance (ddof=1);
- ``VarianceNorm`` divides by sqrt of the UNBIASED spatial variance only
  (no mean subtraction);
- class-conditional variants look up per-class (gamma, alpha, beta) from an
  embedding table; scale entries initialize ~N(1, 0.02) (or U[0,1) where the
  reference uses ``uniform_()``), biases at zero.

Golden-tested against the literal reference module in
``tests/test_normalization_zoo.py``.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray

EPS = 1e-5


def _normal_1_002(key, shape, dtype=jnp.float32):
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


def _split_embed_init(scale_init, n_scale_parts: int):
    """Embedding-table initializer whose first ``n_scale_parts`` feature
    chunks are scale-like (N(1,0.02) or U[0,1)) and whose last chunk is zeros
    (the bias), mirroring the reference's in-place table slicing init."""

    def init(key, shape, dtype=jnp.float32):
        total = shape[-1]
        n = total // (n_scale_parts + 1)
        scales = scale_init(key, shape[:-1] + (n_scale_parts * n,), dtype)
        zeros = jnp.zeros(shape[:-1] + (total - n_scale_parts * n,), dtype)
        return jnp.concatenate([scales, zeros], axis=-1)

    return init


def _instance_norm(x: Array) -> Array:
    """Per-(sample, channel) spatial standardization, biased variance, no
    affine (torch ``InstanceNorm2d(affine=False)``). NHWC."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)  # biased
    return (x - mean) * jax.lax.rsqrt(var + EPS)


def _unbiased_var(x: Array, axis, keepdims=False) -> Array:
    return jnp.var(x, axis=axis, keepdims=keepdims, ddof=1)


class InstanceNorm2dPlus(nn.Module):
    """InstanceNorm++ (ref ``normalization.py:158-185``): instance norm plus a
    re-injected, channel-standardized mean signal — fixes instance norm's
    color-shift problem (NCSNv1 paper, appendix B)."""

    num_features: int
    bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        means = jnp.mean(x, axis=(1, 2))  # (B, C)
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = _unbiased_var(means, axis=-1, keepdims=True)
        means = (means - m) * jax.lax.rsqrt(v + EPS)
        h = _instance_norm(x)
        alpha = self.param("alpha", _normal_1_002, (self.num_features,))
        gamma = self.param("gamma", _normal_1_002, (self.num_features,))
        h = h + means[:, None, None, :] * alpha
        out = gamma * h
        if self.bias:
            beta = self.param("beta", nn.initializers.zeros, (self.num_features,))
            out = out + beta
        return out


class ConditionalInstanceNorm2dPlus(nn.Module):
    """Class-conditional InstanceNorm++ (ref ``:187-216``): per-class
    (gamma, alpha[, beta]) from an embedding table."""

    num_features: int
    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        means = jnp.mean(x, axis=(1, 2))
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = _unbiased_var(means, axis=-1, keepdims=True)
        means = (means - m) * jax.lax.rsqrt(v + EPS)
        h = _instance_norm(x)
        n_emb = 3 if self.bias else 2
        init = _split_embed_init(_normal_1_002, 2) if self.bias else _normal_1_002
        embed = nn.Embed(
            self.num_classes, n_emb * self.num_features,
            embedding_init=init, name="embed",
        )(y.astype(jnp.int32))
        if self.bias:
            gamma, alpha, beta = jnp.split(embed, 3, axis=-1)
            h = h + means[:, None, None, :] * alpha[:, None, None, :]
            return gamma[:, None, None, :] * h + beta[:, None, None, :]
        gamma, alpha = jnp.split(embed, 2, axis=-1)
        h = h + means[:, None, None, :] * alpha[:, None, None, :]
        return gamma[:, None, None, :] * h


class VarianceNorm2d(nn.Module):
    """Scale-only spatial normalization (ref ``:113-125``)."""

    num_features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        v = _unbiased_var(x, axis=(1, 2), keepdims=True)
        h = x * jax.lax.rsqrt(v + EPS)
        alpha = self.param("alpha", _normal_1_002, (self.num_features,))
        return alpha * h


class ConditionalVarianceNorm2d(nn.Module):
    """Class-conditional VarianceNorm (ref ``:96-110``)."""

    num_features: int
    num_classes: int

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        v = _unbiased_var(x, axis=(1, 2), keepdims=True)
        h = x * jax.lax.rsqrt(v + EPS)
        gamma = nn.Embed(
            self.num_classes, self.num_features,
            embedding_init=_normal_1_002, name="embed",
        )(y.astype(jnp.int32))
        return gamma[:, None, None, :] * h


class ConditionalInstanceNorm2d(nn.Module):
    """Class-conditional instance norm (ref ``:70-93``)."""

    num_features: int
    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        h = _instance_norm(x)
        n_emb = 2 if self.bias else 1
        uni = nn.initializers.uniform(scale=1.0)
        init = _split_embed_init(uni, 1) if self.bias else uni
        embed = nn.Embed(
            self.num_classes, n_emb * self.num_features,
            embedding_init=init, name="embed",
        )(y.astype(jnp.int32))
        if self.bias:
            gamma, beta = jnp.split(embed, 2, axis=-1)
            return gamma[:, None, None, :] * h + beta[:, None, None, :]
        return embed[:, None, None, :] * h


class ConditionalNoneNorm2d(nn.Module):
    """Class-conditional affine without normalization (ref ``:127-147``)."""

    num_features: int
    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        n_emb = 2 if self.bias else 1
        uni = nn.initializers.uniform(scale=1.0)
        init = _split_embed_init(uni, 1) if self.bias else uni
        embed = nn.Embed(
            self.num_classes, n_emb * self.num_features,
            embedding_init=init, name="embed",
        )(y.astype(jnp.int32))
        if self.bias:
            gamma, beta = jnp.split(embed, 2, axis=-1)
            return gamma[:, None, None, :] * x + beta[:, None, None, :]
        return embed[:, None, None, :] * x


class NoneNorm2d(nn.Module):
    """Identity (ref ``:150-155``)."""

    num_features: int = 0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return x


def get_normalization(name: str, conditional: bool = False):
    """Normalization dispatcher (ref ``get_normalization :23-41``)."""
    if conditional:
        if name == "InstanceNorm++":
            return ConditionalInstanceNorm2dPlus
        if name == "InstanceNorm":
            return ConditionalInstanceNorm2d
        if name == "VarianceNorm":
            return ConditionalVarianceNorm2d
        if name == "NoneNorm":
            return ConditionalNoneNorm2d
        raise NotImplementedError(f"conditional {name} not implemented")
    if name == "InstanceNorm":
        return lambda num_features: _InstanceNormModule(num_features)
    if name == "InstanceNorm++":
        return InstanceNorm2dPlus
    if name == "VarianceNorm":
        return VarianceNorm2d
    if name == "NoneNorm":
        return NoneNorm2d
    if name == "GroupNorm":
        return lambda num_features: nn.GroupNorm(
            num_groups=min(num_features // 4, 32) or 1, epsilon=1e-5
        )
    raise ValueError(f"Unknown normalization: {name}")


class _InstanceNormModule(nn.Module):
    num_features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return _instance_norm(x)
