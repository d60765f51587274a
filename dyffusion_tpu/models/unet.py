"""ADM-style ResNet-attention UNet — the main DYffusion backbone.

Capability parity with the reference's ``Unet`` (``src/models/unet.py:113-315``):
weight-standardized 3x3 convs + GroupNorm + FiLM time conditioning
(``:58-109``), a downs/ups ladder with two ResNet blocks + pre-norm linear
attention per level and full attention at the mid-block (``:184-231``),
strided-conv downsample / nearest-up + conv upsample (``:16-23``), four
distinct dropout sites (input / block1 / block2 / attn, ``:122-125``), and the
optional outer resampling wrapper for awkward grids (``:151-157, 309-311``).

TPU-first notes: NHWC layout throughout; 1x1 convs are Dense (MXU matmuls);
GroupNorm/FiLM/SiLU fuse into the conv epilogue under XLA.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dyffusion_tpu.models.base import concat_condition
from dyffusion_tpu.models.modules import (
    Attention,
    LinearAttention,
    PreNormResidual,
    TimeEmbedder,
    WSConv,
)

Array = jnp.ndarray


class ResnetBlock(nn.Module):
    """WSConv -> GroupNorm -> FiLM -> SiLU -> Dropout (x2) + residual
    (ref ``unet.py:58-109``)."""

    dim_out: int
    groups: int = 8
    dropout1: float = 0.0
    dropout2: float = 0.0
    double_conv_layer: bool = True
    use_time_emb: bool = True

    @nn.compact
    def __call__(self, x: Array, time_emb: Optional[Array] = None, deterministic: bool = True) -> Array:
        scale_shift = None
        if self.use_time_emb and time_emb is not None:
            emb = nn.Dense(self.dim_out * 2, name="time_mlp")(nn.silu(time_emb))
            emb = emb[:, None, None, :]
            scale_shift = jnp.split(emb, 2, axis=-1)

        h = WSConv(self.dim_out, name="block1_conv")(x)
        # epsilon=1e-5: torch nn.GroupNorm default (flax defaults to 1e-6)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="block1_norm")(h)
        if scale_shift is not None:
            scale, shift = scale_shift
            # cast: the time MLP runs in f32 (sinusoidal emb), and promoting
            # h here would silently upcast the WHOLE network downstream of the
            # first FiLM — defeating bf16 eval (found via a Pallas VMEM OOM)
            h = h * (scale.astype(h.dtype) + 1.0) + shift.astype(h.dtype)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout1)(h, deterministic=deterministic)

        if self.double_conv_layer:
            h = WSConv(self.dim_out, name="block2_conv")(h)
            h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="block2_norm")(h)
            h = nn.silu(h)
            h = nn.Dropout(self.dropout2)(h, deterministic=deterministic)

        if x.shape[-1] != self.dim_out:
            x = nn.Dense(self.dim_out, name="residual_proj")(x)
        return h + x


def _downsample_conv(features: int, name: str):
    """Stride-2 4x4 conv, pad 1 — exact torch Conv2d(4,2,1) geometry
    (ref ``unet.py:22-23``): out = floor(in / 2)."""
    return nn.Conv(features, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)), name=name)


class Upsample(nn.Module):
    """Nearest x2 + 3x3 conv (ref ``unet.py:16-19``), computed FUSED.

    nearest-x2 upsampling is exactly a FIR [1,1] (x) [1,1] upfirdn with up=2,
    and convolution commutes with the FIR filter, so
    ``conv3x3(nearest_up2(x)) == upsample_conv_2d(x, w, k=[1,1])`` — one fused
    transpose-conv instead of materializing the 4x-larger intermediate in HBM
    (the resize alone measured ~12ms at sampler scale; see PERF.md). Parameter
    layout is identical to the unfused version (``conv/kernel``, ``conv/bias``),
    and ``tests/test_models.py`` asserts numerical equality with the unfused
    path."""

    features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from dyffusion_tpu.ops.upfirdn2d import upsample_conv_2d

        C = x.shape[-1]
        # same param path/layout as the unfused nn.Conv(name="conv") version
        p = self.param(
            "conv",
            lambda rng: {
                "kernel": nn.initializers.lecun_normal()(rng, (3, 3, C, self.features)),
                "bias": jnp.zeros((self.features,), jnp.float32),
            },
        )
        w = p["kernel"].astype(x.dtype)
        b = p["bias"].astype(x.dtype)
        return upsample_conv_2d(x, w, k=[1, 1], factor=2) + b


class Unet(nn.Module):
    """The 'unet_resnet' backbone (ref ``unet.py:113-315``)."""

    dim: int
    num_input_channels: int
    num_output_channels: int
    num_conditional_channels: int = 0
    init_dim: Optional[int] = None
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    resnet_block_groups: int = 8
    with_time_emb: bool = False
    block_dropout: float = 0.0  # second block of each resnet block
    block_dropout1: float = 0.0  # first block
    attn_dropout: float = 0.0
    input_dropout: float = 0.0
    double_conv_layer: bool = True
    learned_sinusoidal_cond: bool = False
    learned_sinusoidal_dim: int = 16
    outer_sample_mode: Optional[str] = None  # 'bilinear' | 'nearest'
    upsample_dims: Optional[Tuple[int, int]] = None
    keep_spatial_dims: bool = False
    init_kernel_size: int = 7
    attn_heads: int = 4
    attn_dim_head: int = 32
    # model.remat=true: rematerialize (jax.checkpoint) every ResNet and
    # attention block — the backward recomputes block-internal activations
    # instead of keeping them in HBM, trading ~1 extra forward of FLOPs for
    # activation memory at block granularity. Same params, same dropout
    # draws; grads match to float-reassociation tolerance (~1e-6 relative,
    # tests/test_remat.py). The lever that lets
    # trainer.fold_accumulation_into_batch's bigger physical batch (or a
    # larger grid) fit in HBM.
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x: Array,
        time: Optional[Array] = None,
        condition: Optional[Array] = None,
        deterministic: bool = True,
        train: bool = False,  # unused (no BatchNorm); uniform backbone signature
    ) -> Array:
        x = concat_condition(x, condition, self.num_conditional_channels)
        orig_shape = x.shape[1:3]
        if self.outer_sample_mode is not None:
            assert self.upsample_dims is not None
            method = "bilinear" if self.outer_sample_mode == "bilinear" else "nearest"
            x = jax.image.resize(
                x, (x.shape[0], *self.upsample_dims, x.shape[-1]), method=method,
                antialias=False,  # torch F.interpolate never antialiases
            )

        init_dim = self.init_dim or self.dim
        pad = self.init_kernel_size // 2
        x = nn.Conv(
            init_dim,
            (self.init_kernel_size, self.init_kernel_size),
            padding=((pad, pad), (pad, pad)),
            name="init_conv",
        )(x)
        # two independent input-dropout draws (ref ``unet.py:162-163, 276-277``)
        r = (
            nn.Dropout(self.input_dropout)(x, deterministic=deterministic)
            if self.input_dropout > 0
            else x
        )
        x = nn.Dropout(self.input_dropout)(x, deterministic=deterministic)

        if self.with_time_emb:
            time_dim = self.dim * 2
            t = TimeEmbedder(
                time_dim,
                self.dim,
                learned_sinusoidal=self.learned_sinusoidal_cond,
                learned_sinusoidal_dim=self.learned_sinusoidal_dim,
                name="time_emb",
            )(time)
        else:
            t = None

        dims = [init_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        n_res = len(in_out)

        # remat: wrap at block granularity (self counts as static arg 0; the
        # deterministic bool must be static — it gates Python control flow)
        Res = nn.remat(ResnetBlock, static_argnums=(3,)) if self.remat else ResnetBlock
        PNR = (
            nn.remat(PreNormResidual, static_argnums=(2,)) if self.remat else PreNormResidual
        )

        def res_block(dim_out, name):
            return Res(
                dim_out=dim_out,
                groups=self.resnet_block_groups,
                dropout1=self.block_dropout1,
                dropout2=self.block_dropout,
                double_conv_layer=self.double_conv_layer,
                use_time_emb=self.with_time_emb,
                name=name,
            )

        def lin_attn(dim, name):
            return PNR(
                dim,
                LinearAttention,
                dict(
                    dim=dim,
                    heads=self.attn_heads,
                    dim_head=self.attn_dim_head,
                    dropout=self.attn_dropout,
                    rescale="qkv",
                ),
                name=name,
            )

        hs = []
        for i, (dim_in, dim_out) in enumerate(in_out):
            is_last = i >= n_res - 1
            x = res_block(dim_in, f"down{i}_block1")(x, t, deterministic)
            hs.append(x)
            x = res_block(dim_in, f"down{i}_block2")(x, t, deterministic)
            x = lin_attn(dim_in, f"down{i}_attn")(x, deterministic)
            hs.append(x)
            if not is_last and not self.keep_spatial_dims:
                x = _downsample_conv(dim_out, f"down{i}_downsample")(x)
            else:
                x = nn.Conv(dim_out, (3, 3), padding="SAME", name=f"down{i}_conv")(x)

        mid_dim = dims[-1]
        x = res_block(mid_dim, "mid_block1")(x, t, deterministic)
        x = PNR(
            mid_dim,
            Attention,
            dict(dim=mid_dim, heads=self.attn_heads, dim_head=self.attn_dim_head, dropout=self.attn_dropout),
            name="mid_attn",
        )(x, deterministic)
        x = res_block(mid_dim, "mid_block2")(x, t, deterministic)

        for i, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = i == n_res - 1
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = res_block(dim_out, f"up{i}_block1")(x, t, deterministic)
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = res_block(dim_out, f"up{i}_block2")(x, t, deterministic)
            x = lin_attn(dim_out, f"up{i}_attn")(x, deterministic)
            if not is_last and not self.keep_spatial_dims:
                x = Upsample(dim_in, name=f"up{i}_upsample")(x)
            else:
                x = nn.Conv(dim_in, (3, 3), padding="SAME", name=f"up{i}_conv")(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = res_block(self.dim, "final_res_block")(x, t, deterministic)
        x = nn.Dense(self.num_output_channels, name="final_conv")(x)

        if self.outer_sample_mode is not None:
            method = "bilinear" if self.outer_sample_mode == "bilinear" else "nearest"
            x = jax.image.resize(
                x, (x.shape[0], *orig_shape, x.shape[-1]), method=method,
                antialias=False,  # exit resample downscales; torch doesn't antialias
            )
        return x
