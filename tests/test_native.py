"""Tests for the native host pipeline (ctypes + numpy fallback parity).

When the shared library is not built, the fallbacks serve and these
tests still validate the Python semantics.
"""

import numpy as np
import pytest

from cuembed_tpu import native


def test_remap_indices_matches_numpy():
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 1000, (64, 8)).astype(np.int32)
    remap = rng.permutation(1000).astype(np.int32)
    out = native.remap_indices(idx, remap)
    np.testing.assert_array_equal(out, remap[idx])
    assert out.shape == idx.shape


def test_count_frequencies_matches_numpy():
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 100, 5000).astype(np.int32)
    counts = native.count_frequencies(idx, 100)
    np.testing.assert_array_equal(counts, np.bincount(idx, minlength=100))
    counts2 = native.count_frequencies(idx, 100, counts)
    np.testing.assert_array_equal(counts2, 2 * np.bincount(idx, minlength=100))


def test_extract_row_ids_from_csr():
    offsets = np.array([0, 2, 2, 5, 6], np.int32)
    out = native.extract_row_ids_from_csr(offsets)
    np.testing.assert_array_equal(out, [0, 0, 2, 2, 2, 3])


def test_transpose_stable():
    idx = np.array([3, 1, 3, 0, 1, 3], np.int32)
    sid = np.array([0, 1, 2, 3, 4, 5], np.int32)
    w = np.array([0.5, 0.25, 0.5, 0.25, 0.5, 0.25], np.float32)
    t_i, t_s, t_w = native.transpose(idx, sid, w, num_categories=4)
    np.testing.assert_array_equal(t_i, [0, 1, 1, 3, 3, 3])
    np.testing.assert_array_equal(t_s, [3, 1, 4, 0, 2, 5])  # stable
    np.testing.assert_array_equal(t_w, [0.25, 0.25, 0.5, 0.5, 0.5, 0.25])
    t_i2, t_s2, t_w2 = native.transpose(idx, sid, None, num_categories=4)
    np.testing.assert_array_equal(t_i2, t_i)
    np.testing.assert_array_equal(t_s2, t_s)
    assert t_w2 is None


def test_cold_counts():
    idx = np.array([0, 5, 9, 2, 7, 7, 1, 1, 9], np.int32)
    out = native.cold_counts(idx, hot_rows=5, chunk_elems=4)
    # chunks: [0,5,9,2] -> 2, [7,7,1,1] -> 2, [9, pad 0 ...] -> 1
    np.testing.assert_array_equal(out, [2, 2, 1])


def test_powerlaw_indices_distribution_and_dedup():
    V, H, B, alpha = 10_000, 16, 2_000, 1.05
    out = native.powerlaw_indices(V, H, alpha, B, seed=7)
    assert out.shape == (B, H)
    assert out.min() >= 1 and out.max() <= V
    for row in out[:100]:
        assert np.unique(row).size == H
    # marginal sanity: small ids dominate under alpha > 1
    assert np.mean(out < 100) > 0.3


@pytest.mark.skipif(not native.AVAILABLE, reason="native library not built")
def test_native_deterministic_and_thread_invariant():
    a = native.powerlaw_indices(1000, 8, 1.15, 500, seed=9)
    b = native.powerlaw_indices(1000, 8, 1.15, 500, seed=9)
    np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(not native.AVAILABLE, reason="native library not built")
def test_native_transpose_matches_numpy_fallback():
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 500, 4096).astype(np.int32)
    sid = np.arange(4096, dtype=np.int32)
    w = rng.random(4096).astype(np.float32)
    t_i, t_s, t_w = native.transpose(idx, sid, w, num_categories=500)
    order = np.argsort(idx, kind="stable")
    np.testing.assert_array_equal(t_i, idx[order])
    np.testing.assert_array_equal(t_s, sid[order])
    np.testing.assert_array_equal(t_w, w[order])


def test_offload_prepare_matches_numpy_reference():
    """Native offload prepare == the numpy formulation, including slot
    assignment, dedup order, zero-padded rows, and the overflow error."""
    rng = np.random.default_rng(21)
    hot, V, W, cap = 64, 512, 8, 128
    tail = rng.standard_normal((V - hot, W)).astype(np.float32)
    idx = rng.integers(0, V, (32, 4)).astype(np.int32)

    idx_hot, slot, is_cold, uniq, rows = native.offload_prepare(
        idx, hot, tail, cap
    )
    # numpy reference
    cold = idx >= hot
    uniq_ref = np.unique(idx[cold]) - hot
    np.testing.assert_array_equal(uniq, uniq_ref)
    np.testing.assert_array_equal(is_cold, cold)
    np.testing.assert_array_equal(idx_hot, np.where(cold, 0, idx))
    slot_ref = np.zeros(idx.shape, np.int32)
    slot_ref[cold] = np.searchsorted(uniq_ref, idx[cold] - hot)
    np.testing.assert_array_equal(slot, slot_ref)
    np.testing.assert_array_equal(rows[: uniq_ref.size], tail[uniq_ref])
    np.testing.assert_array_equal(rows[uniq_ref.size :], 0.0)

    with pytest.raises(ValueError, match="cold_cap"):
        native.offload_prepare(idx, hot, tail, 2)


def test_fallback_notice_once(monkeypatch):
    """Without the .so, the first numpy-fallback hot-path call warns once;
    CUEMBED_NATIVE=require turns it into an ImportError."""
    import warnings

    monkeypatch.setattr(native, "AVAILABLE", False)
    monkeypatch.setattr(native, "_HAS_OFFLOAD", False)
    native._fallback_noticed.clear()
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        native.powerlaw_indices(100, 4, 1.05, 8, seed=1)
        native.powerlaw_indices(100, 4, 1.05, 8, seed=2)
    hits = [r for r in rec if "numpy fallback" in str(r.message)]
    assert len(hits) == 1 and "make -C native" in str(hits[0].message)

    monkeypatch.setenv("CUEMBED_NATIVE", "require")
    with pytest.raises(ImportError, match="make -C native"):
        native.offload_prepare(
            np.zeros(4, np.int32), 2, np.zeros((4, 8), np.float32), 4
        )
    native._fallback_noticed.clear()
