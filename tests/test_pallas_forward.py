"""Pallas forward kernel tests (interpreter mode on CPU).

Parity discipline: the kernel reduces each sample's [hotness, width] row
group with the same vectorized-sum semantics as the XLA path, so results
are compared against the golden model at summation-order tolerance, and
bitwise against integer-exact data.
"""

import numpy as np
import pytest

from cuembed_tpu import CombineMode
from cuembed_tpu.ops.pallas_forward import csr_to_fixed, embedding_forward_pallas
from cuembed_tpu.ref import embedding_forward_ref
from cuembed_tpu.utils import AllocationOptions, allocate


def _run(o: AllocationOptions, **kw):
    alloc = allocate(o, forward_only=True)
    got = embedding_forward_pallas(
        alloc.table,
        alloc.indices,
        alloc.offsets,
        alloc.weights,
        mode=o.combine_mode,
        interpret=True,
        **kw,
    )
    ref = embedding_forward_ref(
        alloc.table,
        alloc.indices,
        offsets=alloc.offsets,
        weights=alloc.weights,
        mode=o.combine_mode,
    )
    return np.asarray(got), ref


@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN])
@pytest.mark.parametrize("batch,hotness", [(16, 1), (16, 8), (33, 5)])
def test_fixed_modes(mode, batch, hotness):
    o = AllocationOptions(
        num_categories=200,
        batch_size=batch,
        hotness=hotness,
        embed_width=128,
        alpha=1.05,
        combine_mode=mode,
    )
    got, ref = _run(o)
    np.testing.assert_allclose(got, ref, rtol=2e-6, atol=1e-6)


def test_weighted_sum():
    o = AllocationOptions(
        num_categories=100,
        batch_size=24,
        hotness=6,
        embed_width=256,
        is_weighted=True,
    )
    got, ref = _run(o)
    np.testing.assert_allclose(got, ref, rtol=2e-6, atol=1e-6)


def test_integer_exact_bitwise():
    """Integer-valued table => exact equality regardless of order."""
    rng = np.random.default_rng(0)
    table = rng.integers(-8, 9, size=(64, 128)).astype(np.float32)
    idx = rng.integers(0, 64, size=(17, 9)).astype(np.int32)
    got = embedding_forward_pallas(table, idx, interpret=True)
    ref = embedding_forward_ref(table, idx)
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_csr():
    o = AllocationOptions(
        num_categories=150,
        batch_size=19,
        hotness=7,
        embed_width=128,
        is_csr=True,
    )
    got, ref = _run(o)
    np.testing.assert_allclose(got, ref, rtol=2e-6, atol=1e-6)


def test_csr_mean_zero_hotness():
    table = np.arange(1.0, 1 + 5 * 128, dtype=np.float32).reshape(5, 128)
    offsets = np.array([0, 0, 3], dtype=np.int32)
    idx = np.array([1, 2, 4], dtype=np.int32)
    got = embedding_forward_pallas(
        table, idx, offsets, mode=CombineMode.MEAN, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got)[0], np.zeros(128, np.float32))
    ref = embedding_forward_ref(table, idx, offsets=offsets, mode=CombineMode.MEAN)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6)


def test_bf16_storage_fp32_accum():
    import ml_dtypes

    rng = np.random.default_rng(3)
    table = rng.integers(-4, 5, size=(50, 128)).astype(ml_dtypes.bfloat16)
    idx = rng.integers(0, 50, size=(9, 12)).astype(np.int32)
    got = embedding_forward_pallas(table, idx, interpret=True)
    ref = embedding_forward_ref(table, idx)
    assert np.asarray(got).dtype == table.dtype
    np.testing.assert_array_equal(
        np.asarray(got).astype(np.float32), ref.astype(np.float32)
    )


def test_block_boundary_padding():
    """Batch not a multiple of block_samples pads and slices correctly."""
    rng = np.random.default_rng(5)
    table = rng.standard_normal((30, 128)).astype(np.float32)
    idx = rng.integers(0, 30, size=(13, 3)).astype(np.int32)
    got = embedding_forward_pallas(table, idx, interpret=True, block_samples=8)
    ref = embedding_forward_ref(table, idx)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-6, atol=1e-6)


def test_csr_block_boundary_carry():
    """A sample spanning multiple 512-position kernel blocks accumulates
    across sequential grid steps (the carry), and heavy padding past
    offsets[-1] contributes nothing."""
    rng = np.random.default_rng(8)
    V, B = 300, 5
    table = rng.integers(-8, 9, size=(V, 128)).astype(np.float32)
    # sample 1 alone holds 700 values -> crosses the 512 block boundary
    per = np.array([100, 700, 0, 400, 30])
    offsets = np.zeros(B + 1, np.int32)
    offsets[1:] = np.cumsum(per)
    cap = int(offsets[-1]) + 137  # ragged padding tail
    idx = np.zeros(cap, np.int32)
    idx[: offsets[-1]] = rng.integers(0, V, offsets[-1])
    got = embedding_forward_pallas(table, idx, offsets, interpret=True)
    ref = embedding_forward_ref(table, idx, offsets=offsets)
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_csr_weighted_and_wide():
    o = AllocationOptions(
        num_categories=120,
        batch_size=21,
        hotness=9,
        embed_width=256,  # wtiles = 2
        is_csr=True,
        is_weighted=True,
    )
    got, ref = _run(o)
    np.testing.assert_allclose(got, ref, rtol=2e-6, atol=1e-6)


def test_csr_bf16_storage():
    import ml_dtypes

    rng = np.random.default_rng(9)
    table = rng.integers(-4, 5, size=(60, 128)).astype(ml_dtypes.bfloat16)
    per = rng.integers(0, 6, size=11)
    offsets = np.zeros(12, np.int32)
    offsets[1:] = np.cumsum(per)
    idx = np.zeros(66, np.int32)
    idx[: offsets[-1]] = rng.integers(0, 60, offsets[-1])
    got = embedding_forward_pallas(table, idx, offsets, interpret=True)
    ref = embedding_forward_ref(table, idx, offsets=offsets)
    assert np.asarray(got).dtype == table.dtype
    np.testing.assert_array_equal(
        np.asarray(got).astype(np.float32), ref.astype(np.float32)
    )


def test_csr_to_fixed_roundtrip():
    offsets = np.array([0, 2, 2, 5], dtype=np.int32)
    idx = np.array([7, 3, 1, 2, 9, 0, 0], dtype=np.int32)  # cap 7, nnz 5
    dense, coeff = csr_to_fixed(idx, offsets)
    dense, coeff = np.asarray(dense), np.asarray(coeff)
    assert dense.shape == coeff.shape
    np.testing.assert_array_equal(dense[0, :2], [7, 3])
    np.testing.assert_array_equal(coeff[0, :2], [1, 1])
    assert coeff[1].sum() == 0
    np.testing.assert_array_equal(dense[2, :3], [1, 2, 9])
    assert coeff[2].sum() == 3
    assert coeff.sum() == 5  # pad slots all zero
