"""NCSN++ — the MCVD video-diffusion backbone, TPU-native.

Capability parity with the reference's 2-D ``unetmore`` path
(``src/models/mcvd/ncsnpp_more.py:35-447`` plus the layer zoo in
``layerspp.py``/``layers.py``): positional or Gaussian-Fourier time embedding,
BigGAN-style residual blocks with FIR up/down-sampling and **AdaGN**
conditioning (``get_act_norm``, ``layerspp.py:555-645``: GroupNorm without
affine -> temb-projected scale/shift -> act; block
``ResnetBlockBigGANppGN :646``), the DDPM-style residual block alternative
(``ResnetBlockDDPMpp :344``) whose resolution changes go through standalone
FIR resamplers with **fused** conv+FIR kernels (``layerspp.Upsample/Downsample
:266-337`` with ``with_conv=True`` -> ``up_or_down_sampling.Conv2d``),
multi-head channel attention with NIN 1x1 projections at configured
resolutions (``AttnBlockpp :219-263``), optional binary conditional embedding
(``cond_emb``, ``ncsnpp_more.py:114-118``), skip-rescaling by 1/sqrt(2), and
DDPM variance-scaling init incl. the near-zero ``init_scale=0`` output convs
(``layers.default_init :77-80``).

The (pseudo-)3D variants are intentionally out of scope: their ``layers3d``
module is absent from the reference snapshot, making only the 2-D path usable
(SURVEY.md §2.4). The SPADE variant (``SPADE_NCSNpp``, ``ncsnpp_more.py:451``
+ ``layerspp.MySPADE :98`` / ``ResnetBlockBigGANppSPADE :741`` /
``get_act_norm("spade") :555``) IS implemented here on its reachable 2-D
path: conditioning frames drive spatially-adaptive gamma/beta maps inside
every normalization instead of being concatenated to the input.

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

from dyffusion_tpu.ops.upfirdn2d import (
    conv_downsample_2d,
    downsample_2d,
    upsample_2d,
    upsample_conv_2d,
)

Array = jnp.ndarray

FIR_KERNEL = (1, 3, 3, 1)


def _init(scale: float = 1.0):
    """DDPM init (ref ``layers.default_init :77-80``): variance_scaling
    (fan_avg, uniform); scale 0 becomes 1e-10 (near-zero, not exactly zero)."""
    return nn.initializers.variance_scaling(max(scale, 1e-10), "fan_avg", "uniform")


def _groups(ch: int) -> int:
    """min(ch//4, 32) reduced until it divides ch (ref ``get_norm :543-546``)."""
    g = max(min(ch // 4, 32), 1)
    while ch % g != 0:
        g -= 1
    return g


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


def ddpm_conv(features: int, kernel: int, name: str, init_scale: float = 1.0):
    """3x3/1x1 conv with DDPM variance-scaling init (``init_scale=0`` =>
    near-zero output conv, ref ``layers.ddpm_conv3x3`` + ``default_init``)."""
    return nn.Conv(
        features, (kernel, kernel), padding="SAME",
        kernel_init=_init(init_scale), bias_init=nn.initializers.zeros, name=name,
    )


class ActNorm(nn.Module):
    """norm -> (AdaGN temb conditioning) -> act (ref ``get_act_norm``,
    ``layerspp.py:555-645``): when conditioned, GroupNorm runs WITHOUT affine
    params and the scale/shift come from a temb projection
    (``x = norm(x) * (1 + scale) + shift``, guided-diffusion style)."""

    ch: int

    @nn.compact
    def __call__(self, x: Array, temb: Optional[Array] = None) -> Array:
        if temb is not None:
            # eps=1e-5: ref get_norm("group") (layerspp.py:546)
            h = nn.GroupNorm(
                num_groups=_groups(self.ch), epsilon=1e-5,
                use_bias=False, use_scale=False, name="norm",
            )(x)
            emb = nn.Dense(
                2 * self.ch, kernel_init=_init(), bias_init=nn.initializers.zeros,
                name="dense",
            )(nn.silu(temb))
            scale, shift = jnp.split(emb[:, None, None, :], 2, axis=-1)
            # keep h's dtype (f32 temb path must not upcast the conv path)
            h = h * (1.0 + scale.astype(h.dtype)) + shift.astype(h.dtype)
        else:
            h = nn.GroupNorm(num_groups=_groups(self.ch), epsilon=1e-5, name="norm")(x)
        return nn.silu(h)


class AttnBlockpp(nn.Module):
    """Channel self-attention over spatial tokens with NIN projections
    (ref ``layerspp.py:219-263``; GroupNorm eps=1e-6 there)."""

    channels: int
    n_head_channels: int = 64
    skip_rescale: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, H, W, C = x.shape
        n_heads = max(C // self.n_head_channels, 1)
        h = nn.GroupNorm(num_groups=_groups(C), epsilon=1e-6, name="norm")(x)
        q = nn.Dense(C, kernel_init=_init(), name="nin_q")(h)
        k = nn.Dense(C, kernel_init=_init(), name="nin_k")(h)
        v = nn.Dense(C, kernel_init=_init(), name="nin_v")(h)
        dh = C // n_heads
        q = q.reshape(B, H * W, n_heads, dh)
        k = k.reshape(B, H * W, n_heads, dh)
        v = v.reshape(B, H * W, n_heads, dh)
        sim = jnp.einsum("bihd,bjhd->bhij", q, k) / math.sqrt(dh)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(B, H, W, C)
        out = nn.Dense(C, kernel_init=_init(0.0), name="nin_out")(out)
        if self.skip_rescale:
            return (x + out) / math.sqrt(2.0)
        return x + out


class Upsample(nn.Module):
    """Standalone FIR upsampler (ref ``layerspp.Upsample :266-301``, fir=True):
    ``with_conv=False`` -> plain FIR upsample; ``with_conv=True`` -> the FUSED
    transpose-conv + FIR kernel (ref ``up_or_down_sampling.Conv2d`` ->
    ``upsample_conv_2d :77-139``)."""

    out_ch: Optional[int] = None
    with_conv: bool = False
    fir_kernel: Sequence[int] = FIR_KERNEL

    @nn.compact
    def __call__(self, x: Array) -> Array:
        C = x.shape[-1]
        out_ch = self.out_ch or C
        if not self.with_conv:
            return upsample_2d(x, k=list(self.fir_kernel), factor=2)
        w = self.param("kernel", _init(), (3, 3, C, out_ch))
        b = self.param("bias", nn.initializers.zeros, (out_ch,))
        return upsample_conv_2d(x, w, k=list(self.fir_kernel), factor=2) + b


class Downsample(nn.Module):
    """Standalone FIR downsampler (ref ``layerspp.Downsample :305-337``,
    fir=True): ``with_conv=True`` -> FUSED FIR + strided conv
    (``conv_downsample_2d :142-184``)."""

    out_ch: Optional[int] = None
    with_conv: bool = False
    fir_kernel: Sequence[int] = FIR_KERNEL

    @nn.compact
    def __call__(self, x: Array) -> Array:
        C = x.shape[-1]
        out_ch = self.out_ch or C
        if not self.with_conv:
            return downsample_2d(x, k=list(self.fir_kernel), factor=2)
        w = self.param("kernel", _init(), (3, 3, C, out_ch))
        b = self.param("bias", nn.initializers.zeros, (out_ch,))
        return conv_downsample_2d(x, w, k=list(self.fir_kernel), factor=2) + b


class ResnetBlockBigGAN(nn.Module):
    """BigGAN residual block with AdaGN + FIR resampling
    (ref ``layerspp.ResnetBlockBigGANppGN :646-740``): actnorm(x, temb) ->
    resample h AND x -> conv -> actnorm(h, temb) -> dropout -> near-zero conv
    -> NIN shortcut -> skip-rescale."""

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
        temb_in = temb if self.use_temb else None
        h = ActNorm(C, name="actnorm0")(x, temb_in)
        if self.up:
            h = upsample_2d(h, k=list(self.fir_kernel), factor=2)
            x = upsample_2d(x, k=list(self.fir_kernel), factor=2)
        elif self.down:
            h = downsample_2d(h, k=list(self.fir_kernel), factor=2)
            x = downsample_2d(x, k=list(self.fir_kernel), factor=2)
        h = ddpm_conv(out_ch, 3, name="conv1")(h)
        h = ActNorm(out_ch, name="actnorm1")(h, temb_in)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = ddpm_conv(out_ch, 3, name="conv2", init_scale=0.0)(h)
        if C != out_ch or self.up or self.down:
            x = nn.Dense(out_ch, kernel_init=_init(), name="shortcut")(x)  # NIN 1x1
        if self.skip_rescale:
            return (x + h) / math.sqrt(2.0)
        return x + h


class ResnetBlockDDPM(nn.Module):
    """DDPM-style residual block (ref ``layerspp.ResnetBlockDDPMpp :344-425``):
    GroupNorm(eps=1e-6) -> act -> conv -> +Dense(act(temb)) -> GroupNorm ->
    act -> dropout -> near-zero conv -> NIN shortcut. No internal resampling —
    resolution changes use the standalone :class:`Upsample`/:class:`Downsample`
    (which is where the fused conv-resampling kernels run)."""

    out_ch: Optional[int] = None
    dropout: float = 0.0
    skip_rescale: bool = True
    use_temb: bool = True

    @nn.compact
    def __call__(self, x: Array, temb: Optional[Array] = None, deterministic: bool = True) -> Array:
        C = x.shape[-1]
        out_ch = self.out_ch or C
        h = nn.silu(nn.GroupNorm(num_groups=_groups(C), epsilon=1e-6, name="norm1")(x))
        h = ddpm_conv(out_ch, 3, name="conv1")(h)
        if self.use_temb and temb is not None:
            temb_add = nn.Dense(
                out_ch, kernel_init=_init(), bias_init=nn.initializers.zeros,
                name="temb_proj",
            )(nn.silu(temb))[:, None, None, :]
            h = h + temb_add.astype(h.dtype)
        h = nn.silu(nn.GroupNorm(num_groups=_groups(out_ch), epsilon=1e-6, name="norm2")(h))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = ddpm_conv(out_ch, 3, name="conv2", init_scale=0.0)(h)
        if C != out_ch:
            x = nn.Dense(out_ch, kernel_init=_init(), name="shortcut")(x)  # NIN
        if self.skip_rescale:
            return (x + h) / math.sqrt(2.0)
        return x + h


def _torch_nearest_resize(x: Array, size: tuple[int, int]) -> Array:
    """Nearest-neighbor resize with torch ``F.interpolate(mode="nearest")``
    index semantics (``floor(i * in/out)``; jax.image.resize uses half-pixel
    centers, which picks DIFFERENT source pixels on downscale). Static sizes:
    the gather indices are computed at trace time."""
    import numpy as np

    H, W = x.shape[1:3]
    th, tw = size
    if (H, W) == (th, tw):
        return x
    ih = np.floor(np.arange(th) * (H / th)).astype(np.int32)
    iw = np.floor(np.arange(tw) * (W / tw)).astype(np.int32)
    return x[:, ih][:, :, iw]


class MySPADE(nn.Module):
    """Spatially-adaptive normalization (ref ``layerspp.MySPADE :98-185``,
    2-D path): GroupNorm(affine=False, eps=1e-6) whose gamma/beta are MAPS
    predicted from the (nearest-resized) conditioning frames by a small
    conv MLP — ``out = norm(x) * (1 + gamma(seg)) + beta(seg)``."""

    ch: int
    spade_dim: int = 128

    @nn.compact
    def __call__(self, x: Array, segmap: Array) -> Array:
        h = nn.GroupNorm(
            num_groups=_groups(self.ch), epsilon=1e-6,
            use_bias=False, use_scale=False, name="norm",
        )(x)
        seg = _torch_nearest_resize(segmap, (x.shape[1], x.shape[2])).astype(h.dtype)
        actv = nn.silu(ddpm_conv(self.spade_dim, 3, name="mlp_shared")(seg))
        gamma = ddpm_conv(self.ch, 3, name="mlp_gamma")(actv)
        beta = ddpm_conv(self.ch, 3, name="mlp_beta")(actv)
        return h * (1.0 + gamma) + beta


class SPADEActNorm(nn.Module):
    """``get_act_norm(norm="spade")`` (ref ``layerspp.py:555-645``): MySPADE
    -> optional AdaGN temb scale/shift (``x = spade(x,cond)*(1+s)+b``) -> act.
    With ``use_temb=False`` this is the model's final act-norm (no Dense)."""

    ch: int
    spade_dim: int = 128
    use_temb: bool = True

    @nn.compact
    def __call__(self, x: Array, temb: Optional[Array], cond: Array) -> Array:
        h = MySPADE(self.ch, self.spade_dim, name="spade")(x, cond)
        if self.use_temb and temb is not None:
            emb = nn.Dense(
                2 * self.ch, kernel_init=_init(), bias_init=nn.initializers.zeros,
                name="dense",
            )(nn.silu(temb))
            scale, shift = jnp.split(emb[:, None, None, :], 2, axis=-1)
            h = h * (1.0 + scale.astype(h.dtype)) + shift.astype(h.dtype)
        return nn.silu(h)


class ResnetBlockBigGANSPADE(nn.Module):
    """BigGAN residual block with SPADE act-norms
    (ref ``layerspp.ResnetBlockBigGANppSPADE :741-865``, 2-D path):
    spade-actnorm(x, temb, cond) -> FIR resample h AND x -> conv ->
    spade-actnorm -> dropout -> near-zero conv -> 1x1 shortcut ->
    skip-rescale. The conditioning enters ONLY through the norms."""

    out_ch: Optional[int] = None
    up: bool = False
    down: bool = False
    dropout: float = 0.0
    skip_rescale: bool = True
    use_temb: bool = True
    spade_dim: int = 128
    fir_kernel: Sequence[int] = FIR_KERNEL

    @nn.compact
    def __call__(
        self, x: Array, temb: Optional[Array], cond: Array, deterministic: bool = True
    ) -> Array:
        C = x.shape[-1]
        out_ch = self.out_ch or C
        temb_in = temb if self.use_temb else None
        h = SPADEActNorm(C, self.spade_dim, name="actnorm0")(x, temb_in, cond)
        if self.up:
            h = upsample_2d(h, k=list(self.fir_kernel), factor=2)
            x = upsample_2d(x, k=list(self.fir_kernel), factor=2)
        elif self.down:
            h = downsample_2d(h, k=list(self.fir_kernel), factor=2)
            x = downsample_2d(x, k=list(self.fir_kernel), factor=2)
        h = ddpm_conv(out_ch, 3, name="conv1")(h)
        h = SPADEActNorm(out_ch, self.spade_dim, name="actnorm1")(h, temb_in, cond)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = ddpm_conv(out_ch, 3, name="conv2", init_scale=0.0)(h)
        if C != out_ch or self.up or self.down:
            x = nn.Dense(out_ch, kernel_init=_init(), name="shortcut")(x)  # 1x1 conv
        if self.skip_rescale:
            return (x + h) / math.sqrt(2.0)
        return x + h


class SPADENCSNpp(nn.Module):
    """The SPADE NCSN++ variant (ref ``SPADE_NCSNpp``, ``ncsnpp_more.py:
    451-799``, 2-D path): identical ladder to :class:`NCSNpp` but the
    conditioning frames are NOT concatenated to the input — they modulate
    every normalization via spatially-adaptive gamma/beta (MySPADE). The
    reference hardcodes ``resblock_type="biggan"``, positional time
    embedding, ``fir=True`` and ``skip_rescale=True`` (``:486-489``); its
    ``resblock_type=="ddpm"`` branches are dead code there (the forward
    would pass ``cond`` to a module that doesn't accept it).

    ``condition`` is REQUIRED (the SPADE norms consume it)."""

    dim: int
    num_input_channels: int
    num_output_channels: int
    num_conditional_channels: int
    spade_dim: int = 128
    n_head_channels: int = 64
    dim_mults: Sequence[int] = (1, 2, 3, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (8, 16, 32)
    dropout: float = 0.0
    with_time_emb: bool = True
    cond_emb: bool = False
    skip_rescale: bool = True
    spatial_height: int = 32
    # model.remat=true: block-granular jax.checkpoint (see NCSNpp.remat)
    remat: bool = False

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
        assert condition is not None, "SPADENCSNpp requires conditioning frames"
        nf = self.dim
        n_res = len(self.dim_mults)
        all_res = [self.spatial_height // (2**i) for i in range(n_res)]
        cond = condition

        # positional time embedding (the reference hardcodes it, :488)
        temb = None
        if self.with_time_emb:
            emb = timestep_embedding(time, nf)
            temb = nn.Dense(nf * 4, kernel_init=_init(), name="temb_dense1")(emb)
            temb = nn.Dense(nf * 4, kernel_init=_init(), name="temb_dense2")(nn.silu(temb))
            if self.cond_emb:
                mask = jnp.zeros((x.shape[0],), jnp.int32) if cond_mask is None else cond_mask.astype(jnp.int32)
                cemb = nn.Embed(2, nf // 2, name="cond_emb")(mask)
                temb = jnp.concatenate([temb, cemb], axis=-1)

        def rb(name, **kw):
            cls = ResnetBlockBigGANSPADE
            if self.remat:
                # (self, x, temb, cond, deterministic): deterministic (arg 4)
                # gates Dropout's Python control flow -> static
                cls = nn.remat(cls, static_argnums=(4,))
            return cls(
                dropout=self.dropout, skip_rescale=self.skip_rescale,
                use_temb=self.with_time_emb, spade_dim=self.spade_dim,
                name=name, **kw,
            )

        def attn(name, ch):
            cls = nn.remat(AttnBlockpp) if self.remat else AttnBlockpp
            return cls(ch, self.n_head_channels, self.skip_rescale, name=name)

        # downsampling (cond is NOT concatenated — it feeds the SPADE norms)
        h = ddpm_conv(nf, 3, name="conv_in")(x)
        hs = [h]
        in_ch = nf
        for i_level in range(n_res):
            for i_block in range(self.num_res_blocks):
                out_ch = nf * self.dim_mults[i_level]
                h = rb(f"down{i_level}_block{i_block}", out_ch=out_ch)(h, temb, cond, deterministic)
                in_ch = out_ch
                if all_res[i_level] in self.attn_resolutions:
                    h = attn(f"down{i_level}_attn{i_block}", in_ch)(h)
                hs.append(h)
            if i_level != n_res - 1:
                h = rb(f"down{i_level}_downsample", out_ch=in_ch, down=True)(h, temb, cond, deterministic)
                hs.append(h)

        # middle
        h = rb("mid_block1", out_ch=in_ch)(h, temb, cond, deterministic)
        h = attn("mid_attn", in_ch)(h)
        h = rb("mid_block2", out_ch=in_ch)(h, temb, cond, deterministic)

        # upsampling
        for j, i_level in enumerate(reversed(range(n_res))):
            for i_block in range(self.num_res_blocks + 1):
                out_ch = nf * self.dim_mults[i_level]
                skip = hs.pop()
                h = rb(f"up{j}_block{i_block}", out_ch=out_ch)(
                    jnp.concatenate([h, skip], axis=-1), temb, cond, deterministic
                )
                in_ch = out_ch
            if all_res[i_level] in self.attn_resolutions:
                h = attn(f"up{j}_attn", in_ch)(h)
            if i_level != 0:
                h = rb(f"up{j}_upsample", out_ch=in_ch, up=True)(h, temb, cond, deterministic)
        assert not hs

        # final act-norm is get_act_norm("spade") with NO temb Dense (ref :655-663)
        h = SPADEActNorm(in_ch, self.spade_dim, use_temb=False, name="actnorm_out")(h, None, cond)
        return ddpm_conv(self.num_output_channels, 3, name="conv_out", init_scale=0.0)(h)


class NCSNpp(nn.Module):
    """The 2-D NCSN++ score network (ref ``ncsnpp_more.py:35-447``).

    Channel semantics match the reference host experiment
    (``SimultaneousMultiHorizonForecasting``): the denoised input carries the
    stacked-horizon frames, ``condition`` carries the stacked window frames
    (+ any static channels), concatenated on the channel axis.

    ``resblock_type``: 'biggan' (the reference's hardcoded default,
    ``ncsnpp_more.py:88``) resamples inside the residual blocks; 'ddpm' uses
    :class:`ResnetBlockDDPM` with standalone fused conv-FIR resamplers
    (``resamp_with_conv=True`` hardcoded at ref ``:79``).
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
    resblock_type: str = "biggan"  # 'biggan' | 'ddpm'
    spatial_height: int = 32  # all_resolutions derive from this (ref :82)
    # model.remat=true: rematerialize every residual/attention block under
    # jax.checkpoint — the backward recomputes block activations instead of
    # holding them in HBM (see models/unet.py and PERF.md's fold/remat study)
    remat: bool = False

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
        assert self.resblock_type in ("biggan", "ddpm")
        biggan = self.resblock_type == "biggan"

        if condition is not None:
            x = jnp.concatenate([x, condition], axis=-1)

        # time embedding
        temb = None
        if self.with_time_emb:
            if self.embedding_type == "fourier":
                emb = GaussianFourierProjection(nf, name="fourier_emb")(time)
            else:
                emb = timestep_embedding(time, nf)
            temb = nn.Dense(nf * 4, kernel_init=_init(), name="temb_dense1")(emb)
            temb = nn.Dense(nf * 4, kernel_init=_init(), name="temb_dense2")(nn.silu(temb))
            if self.cond_emb:
                mask = jnp.zeros((x.shape[0],), jnp.int32) if cond_mask is None else cond_mask.astype(jnp.int32)
                cemb = nn.Embed(2, nf // 2, name="cond_emb")(mask)
                temb = jnp.concatenate([temb, cemb], axis=-1)

        def rb(name, **kw):
            cls = ResnetBlockBigGAN if biggan else ResnetBlockDDPM
            if self.remat:
                # deterministic (arg 3; self counts as 0) gates Python control
                # flow inside Dropout, so it must be static under checkpoint
                cls = nn.remat(cls, static_argnums=(3,))
            return cls(
                dropout=self.dropout, skip_rescale=self.skip_rescale,
                use_temb=self.with_time_emb, name=name, **kw,
            )

        def attn(name, ch):
            cls = nn.remat(AttnBlockpp) if self.remat else AttnBlockpp
            return cls(ch, self.n_head_channels, self.skip_rescale, name=name)

        # downsampling
        h = ddpm_conv(nf, 3, name="conv_in")(x)
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
                if biggan:
                    h = rb(f"down{i_level}_downsample", out_ch=in_ch, down=True)(h, temb, deterministic)
                else:
                    # fused FIR + strided conv (ref Downsample with_conv=True)
                    h = Downsample(out_ch=in_ch, with_conv=True, name=f"down{i_level}_downsample")(h)
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
                if biggan:
                    h = rb(f"up{j}_upsample", out_ch=in_ch, up=True)(h, temb, deterministic)
                else:
                    # fused transpose-conv + FIR (ref Upsample with_conv=True)
                    h = Upsample(out_ch=in_ch, with_conv=True, name=f"up{j}_upsample")(h)
        assert not hs

        # eps=1e-5: the final act-norm is get_act_norm("group") -> get_norm
        # (ref layerspp.py:546), NOT the attention block's 1e-6 GroupNorm
        h = nn.silu(nn.GroupNorm(num_groups=_groups(in_ch), epsilon=1e-5, name="norm_out")(h))
        return ddpm_conv(self.num_output_channels, 3, name="conv_out", init_scale=0.0)(h)
