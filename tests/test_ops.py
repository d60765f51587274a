"""Ops tests: upfirdn2d vs a literal numpy reference, FIR resampling, fused act."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dyffusion_tpu.ops import (
    downsample_2d,
    fused_leaky_relu,
    setup_fir_kernel,
    upfirdn2d,
    upsample_2d,
)


def upfirdn2d_numpy(x, kernel, up, down, pad0, pad1):
    """Literal transcription of the reference algorithm
    (op/upfirdn2d.py:150-185) in numpy, NHWC."""
    B, H, W, C = x.shape
    kh, kw = kernel.shape
    # zero-stuff: append (up-1) zeros after each sample
    z = np.zeros((B, H * up, W * up, C), x.dtype)
    z[:, ::up, ::up, :] = x
    # pad / crop
    p = np.pad(
        z,
        ((0, 0), (max(pad0, 0), max(pad1, 0)), (max(pad0, 0), max(pad1, 0)), (0, 0)),
    )
    c0, c1 = max(-pad0, 0), max(-pad1, 0)
    p = p[:, c0 : p.shape[1] - c1, c0 : p.shape[2] - c1, :]
    # correlate with flipped kernel == convolution
    kf = np.flip(kernel)
    out_h = p.shape[1] - kh + 1
    out_w = p.shape[2] - kw + 1
    out = np.zeros((B, out_h, out_w, C), np.float32)
    for i in range(out_h):
        for j in range(out_w):
            patch = p[:, i : i + kh, j : j + kw, :]
            out[:, i, j, :] = np.einsum("bhwc,hw->bc", patch, kf)
    return out[:, ::down, ::down, :]


@pytest.mark.parametrize("up,down,pad", [(1, 1, (1, 1)), (2, 1, (2, 1)), (1, 2, (1, 1)), (2, 2, (2, 2))])
def test_upfirdn2d_matches_reference_algorithm(up, down, pad):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 6, 5, 3)).astype(np.float32)
    k = setup_fir_kernel([1, 3, 3, 1])
    want = upfirdn2d_numpy(x, k, up, down, pad[0], pad[1])
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k), up=up, down=down, pad=pad))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_upfirdn2d_negative_pad():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 8, 8, 2)).astype(np.float32)
    k = setup_fir_kernel([1, 2, 1])
    want = upfirdn2d_numpy(x, k, 1, 1, -1, 2)
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k), pad=(-1, 2)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fir_up_down_roundtrip_shapes():
    x = jnp.ones((2, 8, 8, 4))
    up = upsample_2d(x, k=[1, 3, 3, 1], factor=2)
    assert up.shape == (2, 16, 16, 4)
    down = downsample_2d(up, k=[1, 3, 3, 1], factor=2)
    assert down.shape == (2, 8, 8, 4)
    # constant field preserved in the interior (edges see FIR boundary decay)
    np.testing.assert_allclose(np.asarray(down)[:, 2:-2, 2:-2, :], 1.0, rtol=1e-3, atol=2e-2)


def test_upfirdn2d_differentiable():
    x = jnp.ones((1, 6, 6, 1))
    k = jnp.asarray(setup_fir_kernel([1, 2, 1]))
    g = jax.grad(lambda x: jnp.sum(upfirdn2d(x, k, up=2, pad=(1, 1)) ** 2))(x)
    assert g.shape == x.shape and bool(jnp.all(jnp.isfinite(g)))


def test_fused_leaky_relu_semantics():
    x = jnp.asarray([[-1.0, 2.0], [0.5, -3.0]])
    b = jnp.asarray([1.0, -1.0])
    out = np.asarray(fused_leaky_relu(x, b))
    v = np.asarray(x) + np.asarray(b)
    want = np.where(v >= 0, v, 0.2 * v) * math.sqrt(2.0)
    np.testing.assert_allclose(out, want, rtol=1e-6)


def test_fused_leaky_relu_pallas_matches_xla():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 8, 8, 16)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    a = fused_leaky_relu(x, b, use_pallas=False)
    p = fused_leaky_relu(x, b, use_pallas=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(p), rtol=1e-5, atol=1e-6)


def test_upsample_conv_2d_supports_channel_change():
    """Regression: the fused transpose-conv path must accept Cin != Cout
    (it was only ever exercised with square channel counts before)."""
    from dyffusion_tpu.ops.upfirdn2d import conv_downsample_2d, upsample_conv_2d

    x = jax.random.normal(jax.random.key(0), (2, 6, 5, 3))
    w = jax.random.normal(jax.random.key(1), (3, 3, 3, 7)) * 0.1
    up = upsample_conv_2d(x, w, k=[1, 3, 3, 1], factor=2)
    assert up.shape == (2, 12, 10, 7)
    assert bool(jnp.all(jnp.isfinite(up)))
    down = conv_downsample_2d(x, w, k=[1, 3, 3, 1], factor=2)
    assert down.shape == (2, 3, 3, 7) or down.shape[0] == 2  # strided VALID
    assert bool(jnp.all(jnp.isfinite(down)))


def test_upsample_conv_2d_equals_nearest_plus_conv_for_box_kernel():
    """nearest-x2 == FIR [1,1] upsample, and the FIR commutes with the conv:
    the fused op must match conv3x3(nearest_up2(x)) exactly — the identity
    the UNet's fused Upsample relies on (models/unet.py)."""
    from dyffusion_tpu.ops.upfirdn2d import upsample_conv_2d

    x = jax.random.normal(jax.random.key(2), (2, 6, 5, 3))
    w = jax.random.normal(jax.random.key(3), (3, 3, 3, 4)) * 0.2
    fused = upsample_conv_2d(x, w, k=[1, 1], factor=2)
    xr = jax.image.resize(x, (2, 12, 10, 3), method="nearest")
    ref = jax.lax.conv_general_dilated(
        xr, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize(
    "H,W,C,O,k,p",
    [(5, 7, 3, 4, 3, 1), (4, 4, 2, 2, 3, 1), (8, 3, 1, 5, 3, 1),
     (1, 2, 2, 2, 3, 1), (2, 2, 8, 8, 1, 0), (1, 1, 2, 3, 1, 0)],
)
def test_bilinear_upsample_conv_2d_exact(H, W, C, O, k, p):
    """conv(bilinear_up2(x)) fused into one dilated conv must match the
    unfused pair EXACTLY, including the border where the resize edge-clamps
    but the conv zero-pads (the ghost-line corrections) — this is what the
    UNetSimple decoder blocks run (models/unet_simple.py)."""
    from dyffusion_tpu.ops.upfirdn2d import bilinear_upsample_conv_2d

    rng = np.random.RandomState(H * 100 + W)
    x = jnp.asarray(rng.randn(2, H, W, C), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, C, O), jnp.float32)
    U = jax.image.resize(x, (2, 2 * H, 2 * W, C), method="bilinear")
    ref = jax.lax.conv_general_dilated(
        U, w, (1, 1), ((p, p), (p, p)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    fused = bilinear_upsample_conv_2d(x, w, padding=p)
    assert fused.shape == ref.shape == (2, 2 * H, 2 * W, O)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-5)


def test_bilinear_upsample_conv_2d_matches_torch_pair():
    """Golden cross-check vs torch nn.Upsample(bilinear) + Conv2d — the
    literal reference decoder pattern (ref unet_simple.py:13-82)."""
    torch = pytest.importorskip("torch")
    from dyffusion_tpu.ops.upfirdn2d import bilinear_upsample_conv_2d

    rng = np.random.RandomState(7)
    x = rng.randn(2, 3, 6, 5).astype(np.float32)  # NCHW for torch
    w = (rng.randn(4, 3, 3, 3) * 0.2).astype(np.float32)  # OIHW
    with torch.no_grad():
        u = torch.nn.functional.interpolate(
            torch.from_numpy(x), scale_factor=2, mode="bilinear", align_corners=False
        )
        ref = torch.nn.functional.conv2d(u, torch.from_numpy(w), padding=1).numpy()
    fused = bilinear_upsample_conv_2d(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(w.transpose(2, 3, 1, 0)),
        padding=1,
    )
    np.testing.assert_allclose(
        np.asarray(fused).transpose(0, 3, 1, 2), ref, atol=2e-5
    )


def test_bilinear_upsample_conv_2d_differentiable():
    from dyffusion_tpu.ops.upfirdn2d import bilinear_upsample_conv_2d

    x = jax.random.normal(jax.random.key(5), (1, 4, 4, 2))
    w = jax.random.normal(jax.random.key(6), (3, 3, 2, 3)) * 0.1
    g = jax.grad(lambda a, b: jnp.sum(bilinear_upsample_conv_2d(a, b, 1) ** 2), argnums=(0, 1))(x, w)
    assert all(bool(jnp.all(jnp.isfinite(gi))) for gi in g)
