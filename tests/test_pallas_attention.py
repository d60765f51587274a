"""Pallas linear-attention core vs jnp reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dyffusion_tpu.ops.pallas_attention import _core_reference, linear_attention_core


@pytest.mark.parametrize("N", [128, 100, 300])
def test_pallas_core_matches_reference(N):
    rng = np.random.default_rng(0)
    BH, d = 4, 32
    q, k, v = (jnp.asarray(rng.normal(size=(BH, d, N)).astype(np.float32)) for _ in range(3))
    scale = d**-0.5
    want = _core_reference(q, k, v, scale, N)
    got = linear_attention_core(q, k, v, scale, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)
