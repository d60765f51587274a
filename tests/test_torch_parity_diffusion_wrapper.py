"""Golden parity: make_conditioned_apply vs the literal LDM DiffusionWrapper.

The reference's ``DiffusionWrapper`` (``src/diffusion/ddpm.py:398-424``) routes
conditioning into a denoiser by mode (None/concat/crossattn/hybrid/adm); it is
config-unused there but inventoried. Both wrappers are driven with the same
deterministic toy denoiser (torch NCHW / jax NHWC) and must agree exactly.
"""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests._reference_import import import_reference  # noqa: E402


class _ToyDenoiser(torch.nn.Module):
    """Deterministic function of (x, t, context, y) that distinguishes every
    routing path: which tensor arrived where changes the output."""

    def forward(self, x, t, context=None, y=None):
        out = 2.0 * x.sum(dim=1, keepdim=True) + t.float().view(-1, 1, 1, 1)
        if context is not None:
            out = out + 3.0 * context.sum(dim=1, keepdim=True)
        if y is not None:
            out = out - 5.0 * y.sum(dim=1, keepdim=True)
        return out


def _toy_apply_jax(x, t, context=None, y=None):
    import jax.numpy as jnp

    out = 2.0 * jnp.sum(x, axis=-1, keepdims=True) + t.astype(jnp.float32)[
        :, None, None, None
    ]
    if context is not None:
        out = out + 3.0 * jnp.sum(context, axis=-1, keepdims=True)
    if y is not None:
        out = out - 5.0 * jnp.sum(y, axis=-1, keepdims=True)
    return out


@pytest.mark.parametrize("key", [None, "concat", "crossattn", "hybrid", "adm"])
def test_diffusion_wrapper_routing_parity(key):
    import jax.numpy as jnp

    from dyffusion_tpu.diffusion.ddpm_latent import make_conditioned_apply

    ref_mod = import_reference("src.diffusion.ddpm")
    ref_wrap = ref_mod.DiffusionWrapper(_ToyDenoiser(), conditioning_key=key)

    rs = np.random.RandomState(0)
    x = rs.randn(2, 3, 4, 5).astype(np.float32)  # NCHW
    c1 = rs.randn(2, 2, 4, 5).astype(np.float32)
    c2 = rs.randn(2, 1, 4, 5).astype(np.float32)
    t = np.array([1, 7], dtype=np.int64)

    kwargs_t = {}
    kwargs_j = {}
    if key in ("concat", "hybrid"):
        kwargs_t["c_concat"] = [torch.from_numpy(c1), torch.from_numpy(c2)]
        kwargs_j["c_concat"] = [
            jnp.asarray(c1.transpose(0, 2, 3, 1)),
            jnp.asarray(c2.transpose(0, 2, 3, 1)),
        ]
    if key in ("crossattn", "hybrid", "adm"):
        kwargs_t["c_crossattn"] = [torch.from_numpy(c2), torch.from_numpy(c1)]
        kwargs_j["c_crossattn"] = [
            jnp.asarray(c2.transpose(0, 2, 3, 1)),
            jnp.asarray(c1.transpose(0, 2, 3, 1)),
        ]

    with torch.no_grad():
        ref_out = (
            ref_wrap(torch.from_numpy(x), torch.from_numpy(t), **kwargs_t)
            .numpy()
        )

    ours = make_conditioned_apply(_toy_apply_jax, key)
    out = ours(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t), **kwargs_j)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out, atol=1e-6
    )


def test_diffusion_wrapper_rejects_unknown_key():
    from dyffusion_tpu.diffusion.ddpm_latent import make_conditioned_apply

    with pytest.raises(AssertionError):
        make_conditioned_apply(lambda x, t: x, "bogus")
