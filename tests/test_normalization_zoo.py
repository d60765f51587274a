"""NCSN normalization zoo: golden parity vs the literal reference module
(``src/models/mcvd/normalization.py`` — torch-only imports, loaded read-only).
NHWC here vs NCHW there; weights are ported per test.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests._reference_import import REF_ROOT, load_standalone

ref = load_standalone("ref_normalization", f"{REF_ROOT}/src/models/mcvd/normalization.py")

B, C, H, W = 3, 6, 5, 4


def _x():
    rng = np.random.default_rng(0)
    return rng.normal(size=(B, C, H, W)).astype(np.float32)


def _nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def _to_nchw(y):
    return np.transpose(np.asarray(y), (0, 3, 1, 2))


def test_instance_norm_plus_plus_matches_reference():
    from dyffusion_tpu.models.normalization import InstanceNorm2dPlus

    x = _x()
    torch.manual_seed(0)
    m_ref = ref.InstanceNorm2dPlus(C, bias=True)
    with torch.no_grad():
        y_ref = m_ref(torch.from_numpy(x)).numpy()

    ours = InstanceNorm2dPlus(C, bias=True)
    params = {
        "alpha": jnp.asarray(m_ref.alpha.detach().numpy()),
        "gamma": jnp.asarray(m_ref.gamma.detach().numpy()),
        "beta": jnp.asarray(m_ref.beta.detach().numpy()),
    }
    y = ours.apply({"params": params}, _nhwc(x))
    np.testing.assert_allclose(_to_nchw(y), y_ref, rtol=1e-4, atol=1e-5)


def test_conditional_instance_norm_plus_plus_matches_reference():
    from dyffusion_tpu.models.normalization import ConditionalInstanceNorm2dPlus

    x = _x()
    y_cls = np.array([0, 2, 1])
    torch.manual_seed(1)
    m_ref = ref.ConditionalInstanceNorm2dPlus(C, num_classes=3, bias=True)
    with torch.no_grad():
        y_ref = m_ref(torch.from_numpy(x), torch.from_numpy(y_cls)).numpy()

    ours = ConditionalInstanceNorm2dPlus(C, num_classes=3, bias=True)
    # torch table layout: [:2C]=gamma|alpha scales, [2C:]=beta — identical here
    params = {"embed": {"embedding": jnp.asarray(m_ref.embed.weight.detach().numpy())}}
    y = ours.apply({"params": params}, _nhwc(x), jnp.asarray(y_cls))
    np.testing.assert_allclose(_to_nchw(y), y_ref, rtol=1e-4, atol=1e-5)


def test_variance_norms_match_reference():
    from dyffusion_tpu.models.normalization import ConditionalVarianceNorm2d, VarianceNorm2d

    x = _x()
    torch.manual_seed(2)
    m_ref = ref.VarianceNorm2d(C)
    with torch.no_grad():
        y_ref = m_ref(torch.from_numpy(x)).numpy()
    y = VarianceNorm2d(C).apply(
        {"params": {"alpha": jnp.asarray(m_ref.alpha.detach().numpy())}}, _nhwc(x)
    )
    np.testing.assert_allclose(_to_nchw(y), y_ref, rtol=1e-4, atol=1e-5)

    y_cls = np.array([1, 0, 1])
    m_ref = ref.ConditionalVarianceNorm2d(C, num_classes=2)
    with torch.no_grad():
        y_ref = m_ref(torch.from_numpy(x), torch.from_numpy(y_cls)).numpy()
    y = ConditionalVarianceNorm2d(C, num_classes=2).apply(
        {"params": {"embed": {"embedding": jnp.asarray(m_ref.embed.weight.detach().numpy())}}},
        _nhwc(x), jnp.asarray(y_cls),
    )
    np.testing.assert_allclose(_to_nchw(y), y_ref, rtol=1e-4, atol=1e-5)


def test_conditional_instance_and_none_norm_match_reference():
    from dyffusion_tpu.models.normalization import (
        ConditionalInstanceNorm2d,
        ConditionalNoneNorm2d,
        NoneNorm2d,
    )

    x = _x()
    y_cls = np.array([2, 0, 1])
    torch.manual_seed(3)
    m_ref = ref.ConditionalInstanceNorm2d(C, num_classes=3, bias=True)
    with torch.no_grad():
        y_ref = m_ref(torch.from_numpy(x), torch.from_numpy(y_cls)).numpy()
    y = ConditionalInstanceNorm2d(C, num_classes=3, bias=True).apply(
        {"params": {"embed": {"embedding": jnp.asarray(m_ref.embed.weight.detach().numpy())}}},
        _nhwc(x), jnp.asarray(y_cls),
    )
    np.testing.assert_allclose(_to_nchw(y), y_ref, rtol=1e-4, atol=1e-5)

    m_ref = ref.ConditionalNoneNorm2d(C, num_classes=3, bias=True)
    with torch.no_grad():
        y_ref = m_ref(torch.from_numpy(x), torch.from_numpy(y_cls)).numpy()
    y = ConditionalNoneNorm2d(C, num_classes=3, bias=True).apply(
        {"params": {"embed": {"embedding": jnp.asarray(m_ref.embed.weight.detach().numpy())}}},
        _nhwc(x), jnp.asarray(y_cls),
    )
    np.testing.assert_allclose(_to_nchw(y), y_ref, rtol=1e-4, atol=1e-5)

    assert np.allclose(np.asarray(NoneNorm2d().apply({}, _nhwc(x))), np.asarray(_nhwc(x)))


def test_dispatcher_and_init_statistics():
    from dyffusion_tpu.models.normalization import get_normalization

    for name in ("InstanceNorm", "InstanceNorm++", "VarianceNorm", "NoneNorm", "GroupNorm"):
        cls = get_normalization(name)
        mod = cls(8) if name != "GroupNorm" else cls(8)
        x = jnp.ones((2, 4, 4, 8))
        v = mod.init(jax.random.key(0), x)
        out = mod.apply(v, x)
        assert out.shape == x.shape
    # conditional dispatcher (the reference only wires InstanceNorm++)
    cls = get_normalization("InstanceNorm++", conditional=True)
    mod = cls(8, num_classes=4)
    x = jax.random.normal(jax.random.key(1), (2, 4, 4, 8))
    v = mod.init(jax.random.key(2), x, jnp.array([0, 3]))
    emb = v["params"]["embed"]["embedding"]
    # scale chunks ~N(1, 0.02), bias chunk zero (ref table slicing init)
    assert abs(float(jnp.mean(emb[:, :16])) - 1.0) < 0.05
    assert float(jnp.max(jnp.abs(emb[:, 16:]))) == 0.0
    out = mod.apply(v, x, jnp.array([0, 3]))
    assert bool(jnp.all(jnp.isfinite(out)))
