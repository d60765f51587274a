"""Native-op golden parity vs the literal torch reference CPU paths.

The reference's CUDA ops ship CPU fallbacks that define their exact
semantics: ``upfirdn2d_native`` (``src/models/mcvd/op/upfirdn2d.py:150-185``,
the spec of the 368-LoC CUDA kernel) and ``fused_leaky_relu``'s CPU branch
(``op/fused_act.py:16-19``). Ours are ONE ``lax.conv_general_dilated`` call
(NHWC) and an XLA-fused elementwise (+ optional Pallas kernel) — compared
element-wise here across up/down/pad combinations, including negative pads.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from tests._reference_import import load_standalone

REF_OPS = "/root/reference/src/models/mcvd/op"


@pytest.fixture(scope="module")
def ref_upfirdn():
    return load_standalone("ref_upfirdn2d", f"{REF_OPS}/upfirdn2d.py")


@pytest.fixture(scope="module")
def ref_fused():
    return load_standalone("ref_fused_act", f"{REF_OPS}/fused_act.py")


@pytest.mark.parametrize("up,down,pad,k", [
    (1, 1, (1, 1), 3),       # plain FIR blur
    (2, 1, (2, 1), 4),       # upsample (StyleGAN k=[1,3,3,1] shape)
    (1, 2, (1, 1), 4),       # downsample
    (2, 2, (2, 2), 4),       # both
    (3, 1, (1, 1), 3),       # non-power-of-2 up
    (1, 1, (-1, 2), 3),      # negative pad (crop) path
    (1, 2, (0, -1), 4),      # negative pad + down
])
def test_upfirdn2d_matches_literal_reference(ref_upfirdn, up, down, pad, k):
    from dyffusion_tpu.ops.upfirdn2d import upfirdn2d

    rng = np.random.default_rng(up * 100 + down * 10 + k)
    B, C, H, W = 2, 3, 9, 11
    x = rng.normal(size=(B, C, H, W)).astype(np.float32)
    kern = rng.normal(size=(k, k)).astype(np.float32)

    with torch.no_grad():
        ref = ref_upfirdn.upfirdn2d_native(
            torch.from_numpy(x), torch.from_numpy(kern),
            up, up, down, down, pad[0], pad[1], pad[0], pad[1],
        ).numpy()

    ours = upfirdn2d(
        jnp.asarray(np.moveaxis(x, 1, -1)), jnp.asarray(kern),
        up=up, down=down, pad=pad,
    )
    np.testing.assert_allclose(np.moveaxis(np.asarray(ours), -1, 1), ref,
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("shape", [(2, 8, 4), (3, 5, 6, 4), (2, 3, 4, 5, 6)])
def test_fused_leaky_relu_matches_literal_reference(ref_fused, shape):
    from dyffusion_tpu.ops.fused_act import fused_leaky_relu

    rng = np.random.default_rng(sum(shape))
    # torch layout: channel is axis 1; ours: channel is the LAST axis
    x_t = rng.normal(size=shape).astype(np.float32)
    C = shape[1]
    bias = rng.normal(size=(C,)).astype(np.float32)

    with torch.no_grad():
        ref = ref_fused.fused_leaky_relu(
            torch.from_numpy(x_t), torch.from_numpy(bias)).numpy()

    x_ours = np.moveaxis(x_t, 1, -1)
    ours = np.asarray(fused_leaky_relu(jnp.asarray(x_ours), jnp.asarray(bias)))
    np.testing.assert_allclose(np.moveaxis(ours, -1, 1), ref, rtol=1e-6, atol=1e-7)


def test_fused_leaky_relu_pallas_matches_literal_reference(ref_fused):
    from dyffusion_tpu.ops.fused_act import fused_leaky_relu

    rng = np.random.default_rng(3)
    x_t = rng.normal(size=(4, 16, 6, 5)).astype(np.float32)
    bias = rng.normal(size=(16,)).astype(np.float32)
    with torch.no_grad():
        ref = ref_fused.fused_leaky_relu(
            torch.from_numpy(x_t), torch.from_numpy(bias)).numpy()
    x_ours = jnp.asarray(np.moveaxis(x_t, 1, -1))
    try:
        ours = np.asarray(fused_leaky_relu(x_ours, jnp.asarray(bias), use_pallas=True))
    except Exception:
        pytest.skip("pallas interpret path unavailable on this backend")
    np.testing.assert_allclose(np.moveaxis(ours, -1, 1), ref, rtol=1e-6, atol=1e-6)
