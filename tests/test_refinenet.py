"""RefineNet block zoo: golden parity vs the literal reference
(``src/models/mcvd/layers.py:125-345``), weights ported torch->flax, NHWC.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests._reference_import import import_reference

ref = import_reference("src.models.mcvd.layers")

# The reference's ncsn_conv3x3 CRASHES for bias=False (``conv.bias.data`` on
# a None bias, layers.py:105) — a latent bug proving the RefineNet zoo is
# unreachable in the reference snapshot. Reproduce its intended semantics
# (identical up to the crash) so the golden comparison can run.
_orig_ncsn_conv3x3 = ref.ncsn_conv3x3


def _ncsn_conv3x3_fixed(in_planes, out_planes, stride=1, bias=True, dilation=1, init_scale=1.0, padding=1):
    init_scale = 1e-10 if init_scale == 0 else init_scale
    conv = torch.nn.Conv2d(
        in_planes, out_planes, stride=stride, bias=bias, dilation=dilation,
        padding=padding, kernel_size=3,
    )
    conv.weight.data *= init_scale
    if conv.bias is not None:
        conv.bias.data *= init_scale
    return conv


ref.ncsn_conv3x3 = _ncsn_conv3x3_fixed

F = 8  # features


def _x(c=F, h=6, w=5, b=2, seed=0):
    return np.random.default_rng(seed).normal(size=(b, c, h, w)).astype(np.float32)


def _nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def _to_nchw(y):
    return np.transpose(np.asarray(y), (0, 3, 1, 2))


def _conv_kernel(w):  # torch (O, I, kh, kw) -> flax (kh, kw, I, O)
    return jnp.asarray(np.transpose(w.detach().numpy(), (2, 3, 1, 0)))


def _port_rcu(m, n_blocks, n_stages):
    return {
        f"conv{i}_{j}": {"kernel": _conv_kernel(getattr(m, f"{i+1}_{j+1}_conv").weight)}
        for i in range(n_blocks)
        for j in range(n_stages)
    }


def _port_crp(m, n_stages):
    return {
        f"conv{i}": {"kernel": _conv_kernel(m.convs[i].weight)} for i in range(n_stages)
    }


def _port_msf(m, n_in):
    return {
        f"conv{i}": {
            "kernel": _conv_kernel(m.convs[i].weight),
            "bias": jnp.asarray(m.convs[i].bias.detach().numpy()),
        }
        for i in range(n_in)
    }


@pytest.mark.parametrize("maxpool", [True, False])
def test_crp_block_matches_reference(maxpool):
    from dyffusion_tpu.models.refinenet import CRPBlock

    torch.manual_seed(0)
    x = _x()
    m_ref = ref.CRPBlock(F, n_stages=2, maxpool=maxpool)
    with torch.no_grad():
        y_ref = m_ref(torch.from_numpy(x)).numpy()
    ours = CRPBlock(F, n_stages=2, maxpool=maxpool)
    y = ours.apply({"params": _port_crp(m_ref, 2)}, _nhwc(x))
    np.testing.assert_allclose(_to_nchw(y), y_ref, rtol=1e-4, atol=1e-5)


def test_rcu_block_matches_reference():
    from dyffusion_tpu.models.refinenet import RCUBlock

    torch.manual_seed(1)
    x = _x(seed=1)
    m_ref = ref.RCUBlock(F, n_blocks=2, n_stages=2)
    with torch.no_grad():
        y_ref = m_ref(torch.from_numpy(x)).numpy()
    y = RCUBlock(F, 2, 2).apply({"params": _port_rcu(m_ref, 2, 2)}, _nhwc(x))
    np.testing.assert_allclose(_to_nchw(y), y_ref, rtol=1e-4, atol=1e-5)


def test_msf_block_and_align_corners_resize_match_reference():
    from dyffusion_tpu.models.refinenet import MSFBlock, resize_bilinear_align_corners

    # align-corners bilinear resize == torch F.interpolate(align_corners=True)
    x = _x(c=3, h=4, w=3, seed=2)
    with torch.no_grad():
        y_ref = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=(7, 6), mode="bilinear", align_corners=True
        ).numpy()
    y = resize_bilinear_align_corners(_nhwc(x), (7, 6))
    np.testing.assert_allclose(_to_nchw(y), y_ref, rtol=1e-4, atol=1e-5)

    torch.manual_seed(2)
    xs = [_x(c=4, h=3, w=3, seed=3), _x(c=6, h=6, w=5, seed=4)]
    m_ref = ref.MSFBlock([4, 6], F)
    with torch.no_grad():
        y_ref = m_ref([torch.from_numpy(v) for v in xs], (6, 5)).numpy()
    y = MSFBlock(F).apply({"params": _port_msf(m_ref, 2)}, [_nhwc(v) for v in xs], (6, 5))
    np.testing.assert_allclose(_to_nchw(y), y_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("end", [False, True])
def test_refine_block_matches_reference(end):
    from dyffusion_tpu.models.refinenet import RefineBlock

    torch.manual_seed(3)
    xs = [_x(c=4, h=3, w=3, seed=5), _x(c=6, h=6, w=5, seed=6)]
    m_ref = ref.RefineBlock([4, 6], F, start=False, end=end, maxpool=True)
    with torch.no_grad():
        y_ref = m_ref([torch.from_numpy(v) for v in xs], (6, 5)).numpy()

    params = {
        "adapt0": _port_rcu(m_ref.adapt_convs[0], 2, 2),
        "adapt1": _port_rcu(m_ref.adapt_convs[1], 2, 2),
        "msf": _port_msf(m_ref.msf, 2),
        "crp": _port_crp(m_ref.crp, 2),
        "output": _port_rcu(m_ref.output_convs, 3 if end else 1, 2),
    }
    y = RefineBlock(F, end=end).apply({"params": params}, [_nhwc(v) for v in xs], (6, 5))
    np.testing.assert_allclose(_to_nchw(y), y_ref, rtol=1e-4, atol=1e-5)


def test_cond_refine_block_runs_with_conditional_normalizer():
    """Conditional composition smoke: CondRefineBlock with the (golden-tested)
    ConditionalInstanceNorm2dPlus normalizer — finite, class-sensitive."""
    from dyffusion_tpu.models.normalization import ConditionalInstanceNorm2dPlus
    from dyffusion_tpu.models.refinenet import CondRefineBlock

    def normalizer(features, num_classes, bias=True, name=None):
        return ConditionalInstanceNorm2dPlus(features, num_classes, bias, name=name)

    blk = CondRefineBlock(F, num_classes=3, normalizer=normalizer)
    xs = [_nhwc(_x(c=4, h=3, w=3, seed=7)), _nhwc(_x(c=6, h=6, w=5, seed=8))]
    y_cls = jnp.array([0, 2])
    v = blk.init(jax.random.key(0), xs, y_cls, (6, 5))
    out = blk.apply(v, xs, y_cls, (6, 5))
    assert out.shape == (2, 6, 5, F)
    assert bool(jnp.all(jnp.isfinite(out)))
    out2 = blk.apply(v, xs, jnp.array([1, 1]), (6, 5))
    assert not np.allclose(np.asarray(out), np.asarray(out2))
