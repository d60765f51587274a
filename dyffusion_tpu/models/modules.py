"""Shared NN modules: time embedders, channel-norm, attention.

Capability parity with the reference's ``src/models/modules/{misc,net_norm,
attention}.py``, re-expressed in flax.linen with NHWC layout. 1x1 convs over
channels become ``nn.Dense`` on the last axis (identical math, and XLA maps
them straight onto the MXU as batched matmuls).
"""
from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray


class SinusoidalPosEmb(nn.Module):
    """Transformer-style sinusoidal embedding (ref ``misc.py:20-32``)."""

    dim: int

    @nn.compact
    def __call__(self, t: Array) -> Array:
        half = self.dim // 2
        emb = math.log(10000.0) / (half - 1)
        freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class LearnedSinusoidalPosEmb(nn.Module):
    """Learned-frequency sinusoidal embedding (ref ``misc.py:35-51``).
    Output dim = dim + 1 (raw t is concatenated)."""

    dim: int

    @nn.compact
    def __call__(self, t: Array) -> Array:
        assert self.dim % 2 == 0
        half = self.dim // 2
        w = self.param("weights", nn.initializers.normal(1.0), (half,))
        t = t.astype(jnp.float32)[:, None]
        freqs = t * w[None, :] * 2 * math.pi
        return jnp.concatenate([t, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


class TimeEmbedder(nn.Module):
    """Sinusoidal (or learned) embedding + 2-layer GELU MLP (ref ``misc.py:54-67``)."""

    time_dim: int
    dim: int
    learned_sinusoidal: bool = False
    learned_sinusoidal_dim: int = 16

    @nn.compact
    def __call__(self, t: Array) -> Array:
        if self.learned_sinusoidal:
            emb = LearnedSinusoidalPosEmb(self.learned_sinusoidal_dim)(t)
        else:
            emb = SinusoidalPosEmb(self.dim)(t)
        emb = nn.Dense(self.time_dim)(emb)
        emb = nn.gelu(emb, approximate=False)  # torch nn.GELU() is exact erf
        return nn.Dense(self.time_dim)(emb)


class ChannelLayerNorm(nn.Module):
    """Gain-only LayerNorm over the channel axis (ref ``unet.py:43-52``):
    normalize by channel mean/var (biased), then scale by a learned gain."""

    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        eps = 1e-5 if x.dtype == jnp.float32 else 1e-3
        g = self.param("g", nn.initializers.ones, (self.dim,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + eps) * g


class LinearAttention(nn.Module):
    """Efficient linear attention over spatial tokens (ref ``attention.py:7-44``).

    qkv is a (dropout ->) 1x1 projection; context is a d x e matrix per head
    (two MXU-friendly einsums instead of an N x N attention matrix).

    ``use_pallas=None`` (auto) fuses the whole softmax/context/out chain in a
    Pallas kernel on TPU backends for the 'qkv' rescale — it consumes the qkv
    projection in its NATURAL token-major layout, eliminating the two
    (B, h, d, N) HBM rearrangement copies the XLA path materializes (the
    attention block was the slowest UNet component at sampler scale; PERF.md).
    Numerically identical to the jnp path (tests/test_pallas_attention.py).
    """

    dim: int
    heads: int = 4
    dim_head: int = 32
    dropout: float = 0.0
    rescale: str = "qkv"  # 'qk' | 'qkv'
    use_pallas: Optional[bool] = None  # None = auto (TPU yes, CPU no)

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        B, H, W, C = x.shape
        scale = self.dim_head**-0.5
        hidden = self.heads * self.dim_head
        h = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        qkv = nn.Dense(hidden * 3, use_bias=False, name="to_qkv")(h)

        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = self.rescale == "qkv" and jax.default_backend() != "cpu"
        if use_pallas:
            # serving.export_run traces multi-platform / shape-polymorphic
            # artifacts under force_xla_path(): Pallas is TPU-only and its
            # grid needs static shapes, so the XLA path must win there even
            # over an explicit use_pallas=True
            from dyffusion_tpu.ops.pallas_attention import xla_only_forced

            if xla_only_forced():
                use_pallas = False
        if use_pallas and self.rescale == "qkv":
            from dyffusion_tpu.ops.pallas_attention import linear_attention_qkv

            out = linear_attention_qkv(
                qkv.reshape(B, H * W, 3 * hidden), self.heads, self.dim_head, scale
            )
            out = out.reshape(B, H, W, hidden)
            return nn.Dense(self.dim, name="to_out")(out)

        qkv = qkv.reshape(B, H * W, 3, self.heads, self.dim_head)
        # (B, heads, d, N) to mirror the reference einsum layout
        q, k, v = (jnp.transpose(qkv[:, :, i], (0, 2, 3, 1)) for i in range(3))
        if self.rescale == "qkv":
            q = jax.nn.softmax(q, axis=-2) * scale
            k = jax.nn.softmax(k, axis=-1)
            v = v / (H * W)
        else:  # 'qk'
            q = q * scale
            k = jax.nn.softmax(k, axis=-1)
        context = jnp.einsum("bhdn,bhen->bhde", k, v)
        out = jnp.einsum("bhde,bhdn->bhen", context, q)
        out = jnp.transpose(out, (0, 3, 1, 2)).reshape(B, H, W, hidden)
        return nn.Dense(self.dim, name="to_out")(out)


class Attention(nn.Module):
    """Full softmax attention over spatial tokens (ref ``attention.py:51-73``)."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        B, H, W, C = x.shape
        scale = self.dim_head**-0.5
        hidden = self.heads * self.dim_head
        qkv = nn.Dense(hidden * 3, use_bias=False, name="to_qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, self.heads, self.dim_head)
        q, k, v = (jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3))  # (B, heads, N, d)
        sim = jnp.einsum("bhid,bhjd->bhij", q * scale, k)
        attn = jax.nn.softmax(sim, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, H, W, hidden)
        return nn.Dense(self.dim, name="to_out")(out)


class PreNormResidual(nn.Module):
    """x + fn(norm(x)) (ref ``net_norm.py:5-20`` + ``misc.py:8-14``).

    The inner module is constructed HERE (class + kwargs) so its parameters
    live under this module's scope as ``fn`` — passing a pre-built instance
    would bind it to the parent scope with a construction-order name
    (LinearAttention_0, ...), which is checkpoint-hostile."""

    dim: int
    fn_cls: Any
    fn_kwargs: Dict[str, Any]

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        # explicit (positional-capable) deterministic so the module can sit
        # under nn.remat(static_argnums=(2,)) — lifted checkpoint cannot mark
        # keyword arguments static
        fn = self.fn_cls(**self.fn_kwargs, name="fn")
        return fn(ChannelLayerNorm(self.dim)(x), deterministic=deterministic) + x


def weight_standardize(kernel: Array, eps: float) -> Array:
    """Standardize a conv kernel (kh, kw, cin, cout) over all but cout
    (ref ``unet.py:26-40``, biased variance)."""
    mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(kernel, axis=(0, 1, 2), keepdims=True)
    return (kernel - mean) * jax.lax.rsqrt(var + eps)


class WSConv(nn.Module):
    """Weight-standardized 3x3 conv (arXiv:1903.10520; ref ``unet.py:26-40``)."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: Array) -> Array:
        eps = 1e-5 if x.dtype == jnp.float32 else 1e-3
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        kernel = weight_standardize(kernel, eps)
        pad = k // 2
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(x.dtype)


class DoubleConv(nn.Module):
    """(conv3x3 no-bias -> BatchNorm -> ReLU) x 2 (ref ``upsampling.py:4-22``).

    Config-unused in the reference (no Hydra preset instantiates it); kept for
    inventory parity. ``train`` gates BatchNorm batch-stats mode only.
    """

    features: int
    mid_features: Optional[int] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        mid = self.mid_features or self.features
        for i, feat in enumerate((mid, self.features)):
            x = nn.Conv(feat, (3, 3), padding=1, use_bias=False, name=f"conv{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=f"bn{i}",
            )(x)
            x = nn.relu(x)
        return x


class UpSampler(nn.Module):
    """Up-scale then :class:`DoubleConv` (ref ``upsampling.py:25-44``).

    ``mode='conv'`` uses a kernel-2/stride-2 transposed conv to the halfway
    channel count; interpolation modes (``nearest``/``bilinear``) resize by
    ``scale_factor`` (bilinear with align_corners=True, as torch
    ``nn.Upsample(align_corners=True)``) and let DoubleConv reduce channels
    through the halfway count. Config-unused in the reference.
    """

    in_features: int
    features: int
    mode: str = "conv"
    scale_factor: int = 2

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        h_feat = (self.in_features + self.features) // 2
        if self.mode in ("conv", "convolution"):
            x = nn.ConvTranspose(
                h_feat, (2, 2), strides=(2, 2), padding="VALID", name="up",
            )(x)
            x = DoubleConv(self.features, name="conv")(x, train=train)
        else:
            b, hh, ww, c = x.shape
            out_hw = (hh * self.scale_factor, ww * self.scale_factor)
            if self.mode == "nearest":
                x = jax.image.resize(x, (b, *out_hw, c), method="nearest")
            else:
                from dyffusion_tpu.models.refinenet import resize_bilinear_align_corners

                x = resize_bilinear_align_corners(x, out_hw)
            x = DoubleConv(self.features, mid_features=h_feat, name="conv")(x, train=train)
        return x
