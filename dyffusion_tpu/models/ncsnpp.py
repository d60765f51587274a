"""NCSN++ — the MCVD video-diffusion backbone, TPU-native.

Capability parity with the reference's 2-D ``unetmore`` path
(``src/models/mcvd/ncsnpp_more.py:35-447`` plus the layer zoo in
``layerspp.py``/``layers.py``): positional or Gaussian-Fourier time embedding,
BigGAN-style residual blocks with FIR up/down-sampling (GroupNorm variant,
``layerspp.ResnetBlockBigGANppGN :646``), multi-head channel attention with
NIN 1x1 projections at configured resolutions (``AttnBlockpp :219-263``),
optional binary conditional embedding (``cond_emb``, ``ncsnpp_more.py:114-118``),
skip-rescaling by 1/sqrt(2), and a zero-initialized output conv.

The (pseudo-)3D variants are intentionally out of scope: their ``layers3d``
module is absent from the reference snapshot, making only the 2-D path usable
(SURVEY.md §2.4).

TPU-first: NHWC; FIR resampling routes through the fused
``dyffusion_tpu.ops.upfirdn2d`` (one dilated depthwise conv) instead of the
reference's CUDA kernel; NIN projections are Dense ops on the channel axis.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from dyffusion_tpu.ops.upfirdn2d import downsample_2d, upsample_2d

Array = jnp.ndarray

FIR_KERNEL = (1, 3, 3, 1)


def _groups(ch: int) -> int:
    return max(min(ch // 4, 32), 1)


def timestep_embedding(t: Array, dim: int, max_positions: int = 10000) -> Array:
    """DDPM positional embedding (ref ``layers.get_timestep_embedding :528``)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_positions) * jnp.arange(half, dtype=jnp.float32) / (half - 1))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class GaussianFourierProjection(nn.Module):
    """Random-feature time embedding (ref ``layerspp.py:188``)."""

    embedding_size: int
    scale: float = 16.0

    @nn.compact
    def __call__(self, t: Array) -> Array:
        W = self.param(
            "W", lambda k, s: jax.random.normal(k, s) * self.scale, (self.embedding_size,)
        )
        W = jax.lax.stop_gradient(W)  # fixed random features
        args = t.astype(jnp.float32)[:, None] * W[None, :] * 2 * jnp.pi
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def zero_init_conv(features: int, kernel: int, name: str):
    """3x3/1x1 conv with zero-initialized kernel+bias (ref ``init_scale=0``,
    ``layers.default_init``)."""
    return nn.Conv(
        features, (kernel, kernel), padding="SAME",
        kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros, name=name,
    )


class AttnBlockpp(nn.Module):
    """Channel self-attention over spatial tokens with NIN projections
    (ref ``layerspp.py:219-263``)."""

    channels: int
    n_head_channels: int = 64
    skip_rescale: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, H, W, C = x.shape
        n_heads = max(C // self.n_head_channels, 1)
        h = nn.GroupNorm(num_groups=_groups(C), name="norm")(x)
        q = nn.Dense(C, name="nin_q")(h)
        k = nn.Dense(C, name="nin_k")(h)
        v = nn.Dense(C, name="nin_v")(h)
        dh = C // n_heads
        q = q.reshape(B, H * W, n_heads, dh)
        k = k.reshape(B, H * W, n_heads, dh)
        v = v.reshape(B, H * W, n_heads, dh)
        sim = jnp.einsum("bihd,bjhd->bhij", q, k) / math.sqrt(dh)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(B, H, W, C)
        out = nn.Dense(C, kernel_init=nn.initializers.zeros, name="nin_out")(out)
        if self.skip_rescale:
            return (x + out) / math.sqrt(2.0)
        return x + out


class ResnetBlockBigGAN(nn.Module):
    """BigGAN residual block with GroupNorm + FIR resampling
    (ref ``layerspp.ResnetBlockBigGANppGN :646``)."""

    out_ch: Optional[int] = None
    up: bool = False
    down: bool = False
    dropout: float = 0.0
    skip_rescale: bool = True
    use_temb: bool = True
    fir_kernel: Sequence[int] = FIR_KERNEL

    @nn.compact
    def __call__(self, x: Array, temb: Optional[Array] = None, deterministic: bool = True) -> Array:
        C = x.shape[-1]
        out_ch = self.out_ch or C
        h = nn.silu(nn.GroupNorm(num_groups=_groups(C), name="norm1")(x))
        if self.up:
            h = upsample_2d(h, k=list(self.fir_kernel), factor=2)
            x = upsample_2d(x, k=list(self.fir_kernel), factor=2)
        elif self.down:
            h = downsample_2d(h, k=list(self.fir_kernel), factor=2)
            x = downsample_2d(x, k=list(self.fir_kernel), factor=2)
        h = nn.Conv(out_ch, (3, 3), padding="SAME", name="conv1")(h)
        if self.use_temb and temb is not None:
            h = h + nn.Dense(out_ch, name="temb_proj")(nn.silu(temb))[:, None, None, :]
        h = nn.silu(nn.GroupNorm(num_groups=_groups(out_ch), name="norm2")(h))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = zero_init_conv(out_ch, 3, name="conv2")(h)
        if C != out_ch or self.up or self.down:
            x = nn.Dense(out_ch, name="shortcut")(x)  # NIN 1x1
        if self.skip_rescale:
            return (x + h) / math.sqrt(2.0)
        return x + h


class NCSNpp(nn.Module):
    """The 2-D NCSN++ score network (ref ``ncsnpp_more.py:35-447``).

    Channel semantics match the reference host experiment
    (``SimultaneousMultiHorizonForecasting``): the denoised input carries the
    stacked-horizon frames, ``condition`` carries the stacked window frames
    (+ any static channels), concatenated on the channel axis.
    """

    dim: int
    num_input_channels: int
    num_output_channels: int
    num_conditional_channels: int = 0
    n_head_channels: int = 64
    dim_mults: Sequence[int] = (1, 2, 3, 4)
    num_res_blocks: int = 2  # named resnet_block_groups in the reference ctor
    attn_resolutions: Sequence[int] = (8, 16, 32)
    dropout: float = 0.0
    with_time_emb: bool = True
    cond_emb: bool = False
    embedding_type: str = "positional"  # 'positional' | 'fourier'
    skip_rescale: bool = True
    spatial_height: int = 32  # all_resolutions derive from this (ref :82)

    @nn.compact
    def __call__(
        self,
        x: Array,
        time: Optional[Array] = None,
        condition: Optional[Array] = None,
        cond_mask: Optional[Array] = None,
        deterministic: bool = True,
        train: bool = False,
    ) -> Array:
        nf = self.dim
        n_res = len(self.dim_mults)
        all_res = [self.spatial_height // (2**i) for i in range(n_res)]

        if condition is not None:
            x = jnp.concatenate([x, condition], axis=-1)

        # time embedding
        temb = None
        if self.with_time_emb:
            if self.embedding_type == "fourier":
                emb = GaussianFourierProjection(nf, name="fourier_emb")(time)
            else:
                emb = timestep_embedding(time, nf)
            temb = nn.Dense(nf * 4, name="temb_dense1")(emb)
            temb = nn.Dense(nf * 4, name="temb_dense2")(nn.silu(temb))
            if self.cond_emb:
                mask = jnp.zeros((x.shape[0],), jnp.int32) if cond_mask is None else cond_mask.astype(jnp.int32)
                cemb = nn.Embed(2, nf // 2, name="cond_emb")(mask)
                temb = jnp.concatenate([temb, cemb], axis=-1)

        def rb(name, **kw):
            return ResnetBlockBigGAN(
                dropout=self.dropout, skip_rescale=self.skip_rescale,
                use_temb=self.with_time_emb, name=name, **kw,
            )

        def attn(name, ch):
            return AttnBlockpp(ch, self.n_head_channels, self.skip_rescale, name=name)

        # downsampling
        h = nn.Conv(nf, (3, 3), padding="SAME", name="conv_in")(x)
        hs = [h]
        in_ch = nf
        for i_level in range(n_res):
            for i_block in range(self.num_res_blocks):
                out_ch = nf * self.dim_mults[i_level]
                h = rb(f"down{i_level}_block{i_block}", out_ch=out_ch)(h, temb, deterministic)
                in_ch = out_ch
                if all_res[i_level] in self.attn_resolutions:
                    h = attn(f"down{i_level}_attn{i_block}", in_ch)(h)
                hs.append(h)
            if i_level != n_res - 1:
                h = rb(f"down{i_level}_downsample", out_ch=in_ch, down=True)(h, temb, deterministic)
                hs.append(h)

        # middle
        h = rb("mid_block1", out_ch=in_ch)(h, temb, deterministic)
        h = attn("mid_attn", in_ch)(h)
        h = rb("mid_block2", out_ch=in_ch)(h, temb, deterministic)

        # upsampling
        for j, i_level in enumerate(reversed(range(n_res))):
            for i_block in range(self.num_res_blocks + 1):
                out_ch = nf * self.dim_mults[i_level]
                skip = hs.pop()
                h = rb(f"up{j}_block{i_block}", out_ch=out_ch)(
                    jnp.concatenate([h, skip], axis=-1), temb, deterministic
                )
                in_ch = out_ch
            if all_res[i_level] in self.attn_resolutions:
                h = attn(f"up{j}_attn", in_ch)(h)
            if i_level != 0:
                h = rb(f"up{j}_upsample", out_ch=in_ch, up=True)(h, temb, deterministic)
        assert not hs

        h = nn.silu(nn.GroupNorm(num_groups=_groups(in_ch), name="norm_out")(h))
        return zero_init_conv(self.num_output_channels, 3, name="conv_out")(h)
