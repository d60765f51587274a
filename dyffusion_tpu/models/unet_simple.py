"""Simple encoder/decoder UNet — the Navier-Stokes backbone.

Capability parity with ``src/models/unet_simple.py:13-197`` (the nn-benchmark
UNet): a stride-2 conv encoder and bilinear-upsample decoder of 6+6 blocks with
optional FiLM time conditioning, an outer bilinear resample to a fixed working
resolution (default 256x256; ref ``:98-101, 192-195``) and back to the input
grid at exit — this is how the awkward 221x42 NS grid becomes power-of-two
friendly, which also suits TPU tiling.

Encoder block: conv(k,s=2) -> norm -> FiLM -> LeakyReLU(0.2) -> dropout.
Decoder block: bilinear x2 -> conv(k-1,s=1) -> norm -> FiLM -> ReLU -> dropout,
with skip concats after each decoder block (ref ``_apply_ops :164-179``).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dyffusion_tpu.models.modules import TimeEmbedder

Array = jnp.ndarray

RELU_LEAK = 0.2

# DCGAN-style init (ref ``unet_simple.py:156-162``): conv weights ~ N(0, 0.02),
# BatchNorm scale ~ N(1, 0.02) with zero bias. Applied to every conv /
# transpose-conv / BatchNorm of this model (the reference's ``__init_weights``
# module walk).
DCGAN_CONV_INIT = nn.initializers.normal(stddev=0.02)


def _dcgan_bn_scale_init(key, shape, dtype=jnp.float32):
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


class UNetBlock(nn.Module):
    """One encoder or decoder block (ref ``unet_simple.py:13-82``)."""

    dim_out: int
    transposed: bool = False
    bn: bool = True  # BatchNorm if True, else GroupNorm(8)
    relu: bool = True  # plain ReLU if True, else LeakyReLU(0.2)
    size: int = 4
    pad: int = 1
    dropout: float = 0.0
    use_time_emb: bool = False

    @nn.compact
    def __call__(
        self,
        x: Array,
        time_emb: Optional[Array] = None,
        deterministic: bool = True,
        train: bool = False,
    ) -> Array:
        if not self.transposed:
            x = nn.Conv(
                self.dim_out,
                (self.size, self.size),
                strides=(2, 2),
                padding=((self.pad, self.pad), (self.pad, self.pad)),
                kernel_init=DCGAN_CONV_INIT,
                name="conv",
            )(x)
        else:
            # bilinear x2 + conv computed FUSED as one dilated conv (exact,
            # incl. the resize's edge clamp vs the conv's zero pad — see
            # ops.upfirdn2d.bilinear_upsample_conv_2d; the 4x intermediate
            # never touches HBM, 1.3-1.6x faster at NS decoder scale).
            # Param path/layout identical to the unfused nn.Conv(name="conv").
            from dyffusion_tpu.ops.upfirdn2d import bilinear_upsample_conv_2d

            k = self.size - 1
            C = x.shape[-1]
            p = self.param(
                "conv",
                lambda rng: {
                    "kernel": DCGAN_CONV_INIT(rng, (k, k, C, self.dim_out)),
                    "bias": jnp.zeros((self.dim_out,), jnp.float32),
                },
            )
            x = bilinear_upsample_conv_2d(
                x, p["kernel"].astype(x.dtype), padding=self.pad
            ) + p["bias"].astype(x.dtype)
        if self.bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                scale_init=_dcgan_bn_scale_init, name="norm",
            )(x)
        else:
            x = nn.GroupNorm(num_groups=8, epsilon=1e-5, name="norm")(x)
        if self.use_time_emb and time_emb is not None:
            emb = nn.Dense(self.dim_out * 2, name="time_mlp")(nn.silu(time_emb))[:, None, None, :]
            scale, shift = jnp.split(emb, 2, axis=-1)
            # keep x's dtype: the f32 time MLP must not upcast the conv path
            x = x * (scale.astype(x.dtype) + 1.0) + shift.astype(x.dtype)
        x = nn.relu(x) if self.relu else nn.leaky_relu(x, RELU_LEAK)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class UNetSimple(nn.Module):
    """The simple UNet (ref ``unet_simple.py:85-197``)."""

    dim: int
    num_input_channels: int
    num_output_channels: int
    num_conditional_channels: int = 0
    with_time_emb: bool = False
    outer_sample_mode: str = "bilinear"
    upsample_dims: Optional[Tuple[int, int]] = (256, 256)
    dropout: float = 0.0
    input_dropout: float = 0.0
    # model.remat=true: rematerialize each encoder/decoder block under
    # jax.checkpoint — block activations recomputed in the backward instead
    # of held in HBM; grads equal to float-reassociation tolerance
    # (see models/unet.py and PERF.md)
    remat: bool = False

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
            x = jnp.concatenate([x, condition], axis=-1)  # inputs first (ref :183-184)
        else:
            assert condition is None

        t = TimeEmbedder(self.dim * 2, self.dim, name="time_emb")(time) if self.with_time_emb else None

        orig_shape = x.shape[1:3]
        if self.upsample_dims is not None:
            # antialias=False: torch F.interpolate/nn.Upsample never antialias
            x = jax.image.resize(
                x, (x.shape[0], *self.upsample_dims, x.shape[-1]),
                method=self.outer_sample_mode, antialias=False,
            )

        x = nn.Conv(self.dim, (1, 1), kernel_init=DCGAN_CONV_INIT, name="init_conv")(x)
        if self.input_dropout > 0:
            x = nn.Dropout(self.input_dropout)(x, deterministic=deterministic)

        d = self.dim
        bkw = dict(dropout=self.dropout, use_time_emb=self.with_time_emb)
        enc_specs = [
            dict(dim_out=d * 2, bn=True, relu=False, **bkw),
            dict(dim_out=d * 2, bn=True, relu=False, **bkw),
            dict(dim_out=d * 4, bn=True, relu=False, **bkw),
            dict(dim_out=d * 8, bn=True, relu=False, size=4, **bkw),
            dict(dim_out=d * 8, bn=True, relu=False, size=2, pad=0, **bkw),
            dict(dim_out=d * 8, bn=False, relu=False, size=2, pad=0, **bkw),
        ]
        dec_specs = [
            dict(dim_out=d * 8, bn=True, relu=True, size=2, pad=0, **bkw),
            dict(dim_out=d * 8, bn=True, relu=True, size=2, pad=0, **bkw),
            dict(dim_out=d * 4, bn=True, relu=True, **bkw),
            dict(dim_out=d * 2, bn=True, relu=True, **bkw),
            dict(dim_out=d * 2, bn=True, relu=True, **bkw),
            dict(dim_out=d, bn=True, relu=True, **bkw),
        ]

        # remat at block granularity (deterministic/train are static bools)
        Blk = nn.remat(UNetBlock, static_argnums=(3, 4)) if self.remat else UNetBlock

        skips = []
        for i, spec in enumerate(enc_specs):
            x = Blk(transposed=False, name=f"enc{i}", **spec)(x, t, deterministic, train)
            skips.append(x)

        x = skips.pop()
        for i, spec in enumerate(dec_specs):
            x = Blk(transposed=True, name=f"dec{i}", **spec)(x, t, deterministic, train)
            if skips:
                x = jnp.concatenate([x, skips.pop()], axis=-1)

        # readout: transpose-conv k4 s2 p1 == exact x2 upsample (ref ``:141-151``)
        x = nn.ConvTranspose(
            self.num_output_channels, (4, 4), strides=(2, 2), padding="SAME",
            kernel_init=DCGAN_CONV_INIT, name="readout",
        )(x)

        if self.upsample_dims is not None:
            # the exit resample DOWNSCALES (256x256 -> e.g. 221x42): torch
            # interpolate does not antialias, so neither do we (exact parity)
            x = jax.image.resize(
                x, (x.shape[0], *orig_shape, x.shape[-1]),
                method=self.outer_sample_mode, antialias=False,
            )
        return x
