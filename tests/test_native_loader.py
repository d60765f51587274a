"""Native batch gather + prefetch iterator tests."""
import numpy as np
import pytest

from dyffusion_tpu.data.native_loader import (
    PrefetchIterator,
    gather_batch,
    native_available,
)


def test_native_builds_and_gathers_correctly():
    if not native_available():
        pytest.skip("no C++ toolchain available")
    rng = np.random.default_rng(0)
    src = rng.normal(size=(50, 3, 4, 4)).astype(np.float32)
    idx = rng.integers(0, 50, size=17)
    got = gather_batch(src, idx)
    np.testing.assert_array_equal(got, src[idx])
    # non-f32 dtype
    srcb = (src > 0).astype(bool)
    np.testing.assert_array_equal(gather_batch(srcb, idx), srcb[idx])


def test_gather_fallback_non_contiguous():
    src = np.arange(120, dtype=np.float32).reshape(10, 12)[:, ::2]  # non-contiguous
    idx = np.array([1, 3, 5])
    np.testing.assert_array_equal(gather_batch(src, idx), src[idx])


def test_prefetch_iterator_yields_all_batches():
    rng = np.random.default_rng(1)
    tensors = {
        "dynamics": rng.normal(size=(37, 2, 4, 4, 1)).astype(np.float32),
        "condition": rng.normal(size=(37, 4, 4, 1)).astype(np.float32),
    }
    it = PrefetchIterator(tensors, batch_size=8, shuffle=True, rng=np.random.default_rng(2))
    batches = list(it)
    assert len(batches) == 4  # drop_last
    assert all(b["dynamics"].shape == (8, 2, 4, 4, 1) for b in batches)
    # shuffled coverage without replacement across yielded batches
    seen = np.concatenate([b["dynamics"][:, 0, 0, 0, 0] for b in batches])
    assert len(np.unique(seen)) == 32
