"""Golden parity: DoubleConv / UpSampler vs the literal torch reference.

The reference's ``src/models/modules/upsampling.py`` (DoubleConv ``:4-22``,
UpSampler ``:25-44``) is config-unused there but part of the module inventory;
our flax equivalents live in ``dyffusion_tpu/models/modules.py``. Weights are
ported torch -> flax (incl. randomized BatchNorm running stats) and outputs
compared in eval mode.
"""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests._reference_import import load_standalone, REF_ROOT  # noqa: E402


def _np(t):
    return np.asarray(t.detach().cpu().numpy())


def _t2f_conv(w):  # torch (O, I, kh, kw) -> flax (kh, kw, I, O)
    return _np(w).transpose(2, 3, 1, 0)


def _t2f_convT(w):  # torch ConvTranspose2d (I, O, kh, kw) -> flax, taps flipped
    return np.ascontiguousarray(_np(w)[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))


def _ref_upsampling():
    return load_standalone(
        "ref_upsampling", f"{REF_ROOT}/src/models/modules/upsampling.py"
    )


def _randomize_bn(ref_model, seed):
    g = torch.Generator().manual_seed(seed)
    for m in ref_model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.3)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
            with torch.no_grad():
                m.weight.copy_(torch.randn(m.num_features, generator=g) * 0.1 + 1.0)
                m.bias.copy_(torch.randn(m.num_features, generator=g) * 0.1)


def _port_double_conv(sd, prefix=""):
    """torch DoubleConv state dict -> (params, batch_stats) for our module."""
    params, stats = {}, {}
    for i, (conv_idx, bn_idx) in enumerate(((0, 1), (3, 4))):
        params[f"conv{i}"] = {
            "kernel": _t2f_conv(sd[f"{prefix}double_conv.{conv_idx}.weight"])
        }
        params[f"bn{i}"] = {
            "scale": _np(sd[f"{prefix}double_conv.{bn_idx}.weight"]),
            "bias": _np(sd[f"{prefix}double_conv.{bn_idx}.bias"]),
        }
        stats[f"bn{i}"] = {
            "mean": _np(sd[f"{prefix}double_conv.{bn_idx}.running_mean"]),
            "var": _np(sd[f"{prefix}double_conv.{bn_idx}.running_var"]),
        }
    return params, stats


@pytest.mark.parametrize("mid", [None, 5])
def test_double_conv_parity(mid):
    import jax.numpy as jnp

    from dyffusion_tpu.models.modules import DoubleConv

    ref_mod = _ref_upsampling()
    torch.manual_seed(0)
    ref = ref_mod.DoubleConv(3, 6, mid_channels=mid).eval()
    _randomize_bn(ref, seed=1)

    x = np.random.RandomState(2).randn(2, 3, 9, 7).astype(np.float32)
    with torch.no_grad():
        ref_out = _np(ref(torch.from_numpy(x)))

    params, stats = _port_double_conv(dict(ref.state_dict()))
    ours = DoubleConv(features=6, mid_features=mid)
    out = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out, atol=2e-5, rtol=1e-4
    )


@pytest.mark.parametrize("mode", ["conv", "bilinear", "nearest"])
def test_upsampler_parity(mode):
    import jax.numpy as jnp

    from dyffusion_tpu.models.modules import UpSampler

    ref_mod = _ref_upsampling()
    torch.manual_seed(3)
    ref = ref_mod.UpSampler(8, 4, mode=mode).eval()
    _randomize_bn(ref, seed=4)
    sd = dict(ref.state_dict())

    x = np.random.RandomState(5).randn(2, 8, 6, 5).astype(np.float32)
    with torch.no_grad():
        ref_out = _np(ref(torch.from_numpy(x)))

    conv_params, conv_stats = _port_double_conv(sd, prefix="conv.")
    params = {"conv": conv_params}
    stats = {"conv": conv_stats}
    if mode == "conv":
        params["up"] = {
            "kernel": _t2f_convT(sd["up.weight"]),
            "bias": _np(sd["up.bias"]),
        }
    ours = UpSampler(in_features=8, features=4, mode=mode)
    out = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )
    assert out.shape == (2, 12, 10, 4)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out, atol=2e-5, rtol=1e-4
    )
