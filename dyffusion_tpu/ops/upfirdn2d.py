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
