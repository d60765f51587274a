"""SimpleConvNet — the spring-mesh baseline backbone.

Capability parity with ``src/models/simple_conv_net.py:12-131``: k stacked
conv blocks (conv -> norm -> FiLM -> GELU -> dropout -> residual) with a 1x1
head. NHWC; 1x1 head is a Dense (MXU matmul).

Norm semantics: ``train`` controls BatchNorm running-stat updates only;
``deterministic`` controls dropout only — mirroring the reference where
MC-dropout flips Dropout modules to train mode while BatchNorm stays in eval
(``utils.py:560-574``, ``freeze_model :553-557``).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from dyffusion_tpu.models.modules import TimeEmbedder

Array = jnp.ndarray


def get_norm(name: str, dim: int, train: bool, num_groups: Optional[int] = None):
    """Normalization factory (ref ``utils.py:175-198``)."""
    name = (name or "none").lower()
    if name == "none":
        return lambda x: x
    # epsilon=1e-5 throughout: the torch norm default (flax defaults to 1e-6)
    if name == "batch_norm":
        return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name=None)
    if name == "layer_norm":
        return nn.LayerNorm(epsilon=1e-5)
    if "group" in name:
        # explicit num_groups wins (ConvBlock passes 32, ref
        # simple_conv_net.py:29); the divisor inference is the fallback
        # (ref utils.py:191-196)
        groups = num_groups or max((dim // n for n in range(2, 17) if dim % n == 0), default=None)
        if groups is None:
            raise ValueError(f"group norm cannot infer groups for dim={dim}")
        return nn.GroupNorm(num_groups=groups, epsilon=1e-5)
    if "instance" in name:
        # instance norm == group norm with one group per channel
        return nn.GroupNorm(num_groups=dim, epsilon=1e-5)
    raise ValueError(f"Unknown normalization: {name}")


class ConvBlock(nn.Module):
    """conv -> norm -> FiLM -> GELU -> dropout -> (+residual)
    (ref ``simple_conv_net.py:12-55``)."""

    dim_out: int
    kernel_size: int = 3
    net_normalization: str = "batch_norm"
    residual: bool = True
    dropout: float = 0.0
    use_time_emb: bool = True

    @nn.compact
    def __call__(
        self,
        x: Array,
        time_emb: Optional[Array] = None,
        deterministic: bool = True,
        train: bool = False,
    ) -> Array:
        res = x
        pad = (self.kernel_size - 1) // 2
        h = nn.Conv(
            self.dim_out,
            (self.kernel_size, self.kernel_size),
            padding=((pad, pad), (pad, pad)),
            name="conv",
        )(x)
        norm = get_norm(self.net_normalization, self.dim_out, train, num_groups=32)
        h = norm(h)
        if self.use_time_emb and time_emb is not None:
            emb = nn.Dense(self.dim_out * 2, name="time_mlp")(nn.silu(time_emb))[:, None, None, :]
            scale, shift = jnp.split(emb, 2, axis=-1)
            # keep h's dtype: the f32 time MLP must not upcast the conv path
            h = h * (scale.astype(h.dtype) + 1.0) + shift.astype(h.dtype)
        h = nn.gelu(h, approximate=False)  # torch nn.GELU() is exact erf
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        if self.residual and res.shape[-1] == self.dim_out:
            h = h + res
        return h


class SimpleConvNet(nn.Module):
    """k conv blocks + 1x1 head (ref ``simple_conv_net.py:59-131``)."""

    dim: int
    num_input_channels: int
    num_output_channels: int
    num_conditional_channels: int = 0
    with_time_emb: bool = False
    net_normalization: str = "batch_norm"
    kernel_sizes: Sequence[int] = (7, 3, 3)
    residual: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: Array,
        time: Optional[Array] = None,
        condition: Optional[Array] = None,
        deterministic: bool = True,
        train: bool = False,
    ) -> Array:
        if self.num_conditional_channels > 0:
            assert condition is not None
            x = jnp.concatenate([x, condition], axis=-1)  # inputs first (ref :120-121)
        else:
            assert condition is None

        if self.with_time_emb:
            t = TimeEmbedder(self.dim * 2, self.dim, name="time_emb")(time)
        else:
            t = None

        for i, k in enumerate(self.kernel_sizes):
            x = ConvBlock(
                self.dim,
                kernel_size=k,
                net_normalization=self.net_normalization,
                residual=self.residual,
                dropout=self.dropout,
                use_time_emb=self.with_time_emb,
                name=f"conv{i}",
            )(x, t, deterministic=deterministic, train=train)
        return nn.Dense(self.num_output_channels, name="head")(x)
