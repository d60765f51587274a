"""upfirdn2d — upsample, FIR filter, downsample — TPU-native.

The reference implements this as a hand-written CUDA kernel with templated
tile sizes (``src/models/mcvd/op/upfirdn2d_kernel.cu``, 368 LoC, plus the
autograd wrapper ``op/upfirdn2d.py:15-130``). On TPU the same fused op is ONE
``lax.conv_general_dilated`` call: zero-stuffing is ``lhs_dilation``,
the FIR filter is a depthwise conv, and downsampling is ``window_strides`` —
XLA lowers it straight onto the conv/MXU pipeline, so no hand-written kernel
is needed for the general case (SURVEY.md §2.4 TPU-native obligation).

Semantics match ``upfirdn2d_native`` (``op/upfirdn2d.py:150-185``): append
(up-1) zeros after each sample (out length = in*up), pad by (pad0, pad1)
(negative pads crop), convolve with the FLIPPED kernel, take every down-th
sample. Gradients come for free via XLA's conv transpose rules (the CUDA
version needs a custom double-backward wrapper).

Also provides the four FIR resampling helpers built on it, mirroring
``src/models/mcvd/up_or_down_sampling.py:64-260``.

Layout: NHWC (the reference is NCHW).
"""
from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def setup_fir_kernel(k: Union[Sequence[float], np.ndarray, None], gain: float = 1.0) -> np.ndarray:
    """Normalize a (possibly separable 1-D) FIR kernel to 2-D, sum 1 * gain
    (ref ``up_or_down_sampling._setup_kernel`` / ``op`` helpers)."""
    if k is None:
        k = [1.0] * 2
    k = np.asarray(k, np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / k.sum()
    return k * gain


def upfirdn2d(
    x: Array,
    kernel: Array,
    up: Union[int, Tuple[int, int]] = 1,
    down: Union[int, Tuple[int, int]] = 1,
    pad: Tuple[int, int] = (0, 0),
) -> Array:
    """Fused upsample-FIR-downsample on NHWC input.

    Args:
        x: (B, H, W, C).
        kernel: (kh, kw) FIR filter.
        up / down: int or (y, x) factors.
        pad: (pad0, pad1) applied to both spatial dims (negative = crop),
            exactly as the reference single-`pad` entry point
            (``op/upfirdn2d.py:15``).
    """
    up_y, up_x = (up, up) if isinstance(up, int) else up
    down_y, down_x = (down, down) if isinstance(down, int) else down
    pad0, pad1 = pad
    B, H, W, C = x.shape
    kernel = jnp.asarray(kernel, x.dtype)
    kh, kw = kernel.shape

    # negative padding = crop of the zero-stuffed signal; conv padding must be
    # >= 0, so crop explicitly first on the dilated grid by slicing the input
    # domain. Handle via explicit pad/crop of the zero-stuffed signal only
    # when negative (rare: only extreme down factors).
    if pad0 < 0 or pad1 < 0:
        # materialize zero-stuffing then crop (correct but slower path)
        z = jnp.zeros((B, H * up_y, W * up_x, C), x.dtype)
        z = z.at[:, ::up_y, ::up_x, :].set(x)
        c0, c1 = max(-pad0, 0), max(-pad1, 0)
        z = z[:, c0 : z.shape[1] - c1, c0 : z.shape[2] - c1, :]
        p0, p1 = max(pad0, 0), max(pad1, 0)
        w_flip = jnp.flip(kernel)[:, :, None, None] * jnp.ones((1, 1, 1, C), x.dtype)
        return jax.lax.conv_general_dilated(
            z, w_flip,
            window_strides=(down_y, down_x),
            padding=((p0, p1), (p0, p1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )

    # fused fast path: zero-stuff == lhs_dilation; reference zero-stuffing
    # APPENDS (up-1) zeros per sample (length in*up) while lhs_dilation
    # inserts them BETWEEN samples (length (in-1)*up + 1), so add the missing
    # (up-1) trailing zeros to the end padding.
    w_flip = jnp.flip(kernel)[:, :, None, None] * jnp.ones((1, 1, 1, C), x.dtype)
    return jax.lax.conv_general_dilated(
        x, w_flip,
        window_strides=(down_y, down_x),
        padding=((pad0, pad1 + up_y - 1), (pad0, pad1 + up_x - 1)),
        lhs_dilation=(up_y, up_x),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


# -- FIR resampling helpers (ref up_or_down_sampling.py:64-260) -------------


def upsample_2d(x: Array, k=None, factor: int = 2, gain: float = 1.0) -> Array:
    """FIR-filtered 2x (or factor-x) upsampling (ref ``:200-229``)."""
    assert factor >= 1
    k = setup_fir_kernel(k, gain * (factor**2))
    p = k.shape[0] - factor
    return upfirdn2d(x, jnp.asarray(k), up=factor, pad=((p + 1) // 2 + factor - 1, p // 2))


def downsample_2d(x: Array, k=None, factor: int = 2, gain: float = 1.0) -> Array:
    """FIR-filtered downsampling (ref ``:232-260``)."""
    assert factor >= 1
    k = setup_fir_kernel(k, gain)
    p = k.shape[0] - factor
    return upfirdn2d(x, jnp.asarray(k), down=factor, pad=((p + 1) // 2, p // 2))


def upsample_conv_2d(x: Array, w: Array, k=None, factor: int = 2, gain: float = 1.0) -> Array:
    """Fused transpose-conv upsample + FIR (ref ``:77-139``): here expressed
    as conv_transpose followed by the FIR correction filter — XLA fuses the
    pair; w is (kh, kw, Cin, Cout) HWIO."""
    assert factor >= 1
    kh, kw = w.shape[0], w.shape[1]
    k = setup_fir_kernel(k, gain * (factor**2))
    p = (k.shape[0] - factor) - (kw - 1)
    # fractionally-strided correlation with w as-is (plain HWIO, Cin != Cout
    # supported): zero-insert by `factor` then correlate — the FIR correction
    # after it commutes with the conv, so for k=[1,1] this equals
    # conv(nearest_up(x), w) exactly (see models/unet.py::Upsample).
    out = jax.lax.conv_transpose(
        x, w, strides=(factor, factor), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=False,
    )
    return upfirdn2d(out, jnp.asarray(k), pad=((p + 1) // 2 + factor - 1, p // 2 + 1))


_BILINEAR_K1 = np.array([1.0, 3.0, 3.0, 1.0], np.float32) / 4.0


def _ext_fir_1d(row: Array) -> Array:
    """Extended 2x bilinear-FIR upsample of (B, L, C) rows, INCLUDING the two
    ghost samples the FIR produces past each end of the true output (indices
    -1 and 2(L-2)): output length 2L-2. Used for the exact border corrections
    of :func:`bilinear_upsample_conv_2d`."""
    B, L, C = row.shape
    k = jnp.asarray(_BILINEAR_K1, row.dtype)[:, None, None, None] * jnp.ones(
        (1, 1, 1, C), row.dtype
    )
    y = jax.lax.conv_general_dilated(
        row[:, :, None, :], k, (1, 1), padding=((1, 1), (0, 0)),
        lhs_dilation=(2, 1), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )
    return y[:, :, 0, :]


def _conv1d_valid(g: Array, w_slice: Array) -> Array:
    """VALID 1-D conv of (B, L, C) with a (kw, C, O) kernel slice."""
    y = jax.lax.conv_general_dilated(
        g[:, :, None, :], w_slice[:, None, :, :], (1, 1),
        padding=((0, 0), (0, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y[:, :, 0, :]


def bilinear_upsample_conv_2d(x: Array, w: Array, padding: int) -> Array:
    """``conv(bilinear_up2(x))`` computed FUSED — exactly one MXU conv.

    Replaces the decoder pattern ``jax.image.resize(x, 2x, "bilinear")`` (torch
    ``nn.Upsample(align_corners=False)``) followed by ``nn.Conv`` (ref
    ``unet_simple.py:13-82`` decoder blocks): half-pixel bilinear x2 is exactly
    an upfirdn with FIR [1,3,3,1]/4 on the edge-padded input, and the FIR
    commutes into the conv kernel, so the pair becomes ONE
    ``conv_general_dilated`` with a compound (kh+3, kw+3) kernel and
    ``lhs_dilation=2`` — the 4x-larger bilinear intermediate never touches HBM
    (measured 1.3-1.6x faster at NS decoder scale, see PERF.md).

    The resize clamps at edges (handled by the 1-pixel edge-pad) while the conv
    zero-pads the RESIZED image; with ``padding=1`` the fused conv would extend
    the FIR past the border instead, so the exact difference — the four ghost
    lines' contribution — is subtracted from the 1-pixel output border via four
    thin VALID 1-D convs (+4 corner add-backs). Bit-level parity with the
    unfused pair is tested in ``tests/test_ops.py``.

    Args:
        x: (B, H, W, C) input (NHWC).
        w: (kh, kw, C, O) HWIO conv kernel, square, ``kh == kw``.
        padding: conv zero-padding of the unfused pair; 0 or 1 with
            ``kh == 2*padding + 1`` (the decoder's k=1/p=0 and k=3/p=1 cases).

    Returns:
        (B, 2H, 2W, O), numerically equal to
        ``conv(resize_bilinear_2x(x), w, padding)``.
    """
    kh, kw, _, _ = w.shape
    assert kh == kw and padding in (0, 1) and kh == 2 * padding + 1, (kh, kw, padding)
    K = np.outer(_BILINEAR_K1, _BILINEAR_K1)
    w_eff = jnp.zeros((kh + 3, kw + 3) + w.shape[2:], w.dtype)
    for a in range(4):
        for b in range(4):
            # float(): a numpy scalar would promote bf16 w to f32, making the
            # scatter-add into the bf16 w_eff an unsafe cast (FutureWarning,
            # an error in future jax); a Python float stays weakly typed
            w_eff = w_eff.at[a : a + kh, b : b + kw].add(float(K[a, b]) * w)
    e = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    out = jax.lax.conv_general_dilated(
        e, w_eff, (1, 1), padding=((padding, padding), (padding, padding)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if padding == 0:
        # kw=1: every output tap lands inside the true resized image — exact.
        return out

    # padding=1, kw=3: border outputs touched the FIR's ghost lines; subtract
    # their contribution and add back the double-subtracted ghost corners.
    g_top = _ext_fir_1d(0.75 * e[:, 0] + 0.25 * e[:, 1])
    g_bot = _ext_fir_1d(0.75 * e[:, -1] + 0.25 * e[:, -2])
    g_left = _ext_fir_1d(0.75 * e[:, :, 0] + 0.25 * e[:, :, 1])
    g_right = _ext_fir_1d(0.75 * e[:, :, -1] + 0.25 * e[:, :, -2])
    out = out.at[:, 0, :, :].add(-_conv1d_valid(g_top, w[0]))
    out = out.at[:, -1, :, :].add(-_conv1d_valid(g_bot, w[2]))
    out = out.at[:, :, 0, :].add(-_conv1d_valid(g_left, w[:, 0]))
    out = out.at[:, :, -1, :].add(-_conv1d_valid(g_right, w[:, 2]))
    out = out.at[:, 0, 0, :].add(jnp.einsum("bc,co->bo", g_top[:, 0], w[0, 0]))
    out = out.at[:, 0, -1, :].add(jnp.einsum("bc,co->bo", g_top[:, -1], w[0, 2]))
    out = out.at[:, -1, 0, :].add(jnp.einsum("bc,co->bo", g_bot[:, 0], w[2, 0]))
    out = out.at[:, -1, -1, :].add(jnp.einsum("bc,co->bo", g_bot[:, -1], w[2, 2]))
    return out


def conv_downsample_2d(x: Array, w: Array, k=None, factor: int = 2, gain: float = 1.0) -> Array:
    """FIR + strided conv downsample (ref ``:142-184``)."""
    assert factor >= 1
    k = setup_fir_kernel(k, gain)
    p = (k.shape[0] - factor) + (w.shape[1] - 1)
    x = upfirdn2d(x, jnp.asarray(k), pad=((p + 1) // 2, p // 2))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(factor, factor), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
