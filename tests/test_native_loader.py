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


def test_gather_negative_and_oob_indices_match_numpy():
    """Negative indices index from the end on BOTH paths; OOB raises
    (the raw C++ kernel would otherwise read out of bounds)."""
    rng = np.random.default_rng(1)
    src = rng.normal(size=(20, 5)).astype(np.float32)
    idx = np.array([-1, 0, -20, 19])
    np.testing.assert_array_equal(gather_batch(src, idx), src[idx])
    for bad in ([20], [-21]):
        with pytest.raises(IndexError):
            gather_batch(src, np.array(bad))


def test_gather_empty_indices():
    src = np.ones((4, 3), np.float32)
    out = gather_batch(src, np.array([], np.int64))
    assert out.shape == (0, 3) and out.dtype == np.float32
    out32 = gather_batch(src.astype(np.float64), np.array([], np.int64), out_dtype=np.float32)
    assert out32.dtype == np.float32


def test_gather_fused_f64_to_f32():
    """out_dtype=f32 on an f64 source uses the fused native kernel (or the
    equivalent numpy fallback) — one documented public entry point."""
    rng = np.random.default_rng(2)
    src = rng.normal(size=(30, 4, 4)).astype(np.float64)
    idx = rng.integers(-30, 30, size=11)
    got = gather_batch(src, idx, out_dtype=np.float32)
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, src[idx].astype(np.float32))
    # out_dtype on an already-f32 source is a plain cast-after-gather
    got2 = gather_batch(src.astype(np.float32), idx, out_dtype=np.float32)
    np.testing.assert_array_equal(got2, src[idx].astype(np.float32))


def test_prefetch_iterator_propagates_worker_errors():
    """A failure while assembling/staging a batch must surface, not silently
    truncate the epoch."""
    tensors = {"x": np.arange(40, dtype=np.float32).reshape(10, 4)}
    calls = {"n": 0}

    def bad_put(batch):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("device OOM staging batch")
        return batch

    it = PrefetchIterator(tensors, batch_size=2, shuffle=False, device_put=bad_put)
    with pytest.raises(RuntimeError, match="device OOM"):
        list(it)


def test_prefetch_iterator_early_break_reaps_worker():
    """A consumer that stops early (max_steps break) must not leak a worker
    thread blocked on the queue."""
    import threading

    tensors = {"x": np.arange(400, dtype=np.float32).reshape(100, 4)}
    before = threading.active_count()
    for _ in range(5):
        for i, batch in enumerate(PrefetchIterator(tensors, batch_size=2, shuffle=False)):
            if i == 1:
                break
    # workers get a grace period to notice the stop event
    deadline = __import__("time").time() + 10.0
    while threading.active_count() > before and __import__("time").time() < deadline:
        __import__("time").sleep(0.05)
    assert threading.active_count() <= before
