"""Golden-value forward tests.

The same hand-computed fixture as the reference's
``tests/test_embedding_forward.cu:120-160``: a 5-row, width-4 table with
batch 2, hotness 2, exercised for every combine mode × weighted × CSR/fixed
on both the numpy golden model and the jitted XLA path. Expected outputs
are inlined (bitwise-exact integer-friendly values).
"""

import numpy as np
import pytest

from cuembed_tpu import CombineMode, embedding_forward_xla
from cuembed_tpu.ref import embedding_forward_ref

TABLE = np.arange(1.0, 21.0, dtype=np.float32).reshape(5, 4)
INDICES = np.array([[1, 3], [0, 4]], dtype=np.int32)
CSR_INDICES = np.array([1, 3, 0, 4], dtype=np.int32)
OFFSETS = np.array([0, 2, 4], dtype=np.int32)
WEIGHTS = np.array([[1.0, 0.5], [1.0, 0.5]], dtype=np.float32)
CSR_WEIGHTS = WEIGHTS.reshape(-1)

EXPECTED_CONCAT = np.array(
    [
        [5, 6, 7, 8],
        [13, 14, 15, 16],
        [1, 2, 3, 4],
        [17, 18, 19, 20],
    ],
    dtype=np.float32,
)
EXPECTED_SUM = np.array(
    [[18, 20, 22, 24], [18, 20, 22, 24]], dtype=np.float32
)
EXPECTED_MEAN = np.array([[9, 10, 11, 12], [9, 10, 11, 12]], dtype=np.float32)
EXPECTED_SUM_WEIGHTED = np.array(
    [[11.5, 13, 14.5, 16], [9.5, 11, 12.5, 14]], dtype=np.float32
)


def cases():
    yield CombineMode.SUM, False, EXPECTED_SUM
    yield CombineMode.SUM, True, EXPECTED_SUM_WEIGHTED
    yield CombineMode.MEAN, False, EXPECTED_MEAN
    yield CombineMode.CONCAT, False, EXPECTED_CONCAT


@pytest.mark.parametrize("mode,weighted,expected", list(cases()))
def test_fixed_hotness_ref(mode, weighted, expected):
    got = embedding_forward_ref(
        TABLE, INDICES, weights=WEIGHTS if weighted else None, mode=mode
    )
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize("mode,weighted,expected", list(cases()))
def test_fixed_hotness_xla(mode, weighted, expected):
    got = embedding_forward_xla(
        TABLE, INDICES, weights=WEIGHTS if weighted else None, mode=mode
    )
    np.testing.assert_array_equal(np.asarray(got), expected)


@pytest.mark.parametrize(
    "mode,weighted,expected",
    [
        (CombineMode.SUM, False, EXPECTED_SUM),
        (CombineMode.SUM, True, EXPECTED_SUM_WEIGHTED),
        (CombineMode.MEAN, False, EXPECTED_MEAN),
    ],
)
def test_csr_ref_and_xla(mode, weighted, expected):
    w = CSR_WEIGHTS if weighted else None
    got_ref = embedding_forward_ref(
        TABLE, CSR_INDICES, offsets=OFFSETS, weights=w, mode=mode
    )
    np.testing.assert_array_equal(got_ref, expected)
    got_xla = embedding_forward_xla(
        TABLE, CSR_INDICES, offsets=OFFSETS, weights=w, mode=mode
    )
    np.testing.assert_array_equal(np.asarray(got_xla), expected)


def test_csr_zero_hotness_mean_is_zero():
    """Zero-hotness MEAN produces exact zeros (embedding_lookup_cpu.hpp:82-86)."""
    offsets = np.array([0, 0, 2], dtype=np.int32)
    idx = np.array([1, 3], dtype=np.int32)
    got_ref = embedding_forward_ref(
        TABLE, idx, offsets=offsets, mode=CombineMode.MEAN
    )
    got_xla = embedding_forward_xla(
        TABLE, idx, offsets=offsets, mode=CombineMode.MEAN
    )
    np.testing.assert_array_equal(got_ref[0], np.zeros(4, np.float32))
    np.testing.assert_array_equal(np.asarray(got_xla), got_ref)


def test_csr_padding_ignored():
    """Positions >= offsets[-1] are padding and contribute nothing."""
    idx_padded = np.array([1, 3, 0, 4, 2, 2, 2], dtype=np.int32)
    got = embedding_forward_xla(
        TABLE, idx_padded, offsets=OFFSETS, mode=CombineMode.SUM
    )
    np.testing.assert_array_equal(np.asarray(got), EXPECTED_SUM)


def test_int64_indices():
    got = embedding_forward_xla(
        TABLE, INDICES.astype(np.int64), mode=CombineMode.SUM
    )
    np.testing.assert_array_equal(np.asarray(got), EXPECTED_SUM)


@pytest.mark.parametrize("dtype", [np.float16, "bfloat16"])
def test_half_storage_fp32_accum(dtype):
    """Half-storage tables reduce in fp32 by default (VecTypeHelper analog)."""
    import ml_dtypes

    dt = np.dtype(ml_dtypes.bfloat16) if dtype == "bfloat16" else np.dtype(dtype)
    table = TABLE.astype(dt)
    got_ref = embedding_forward_ref(table, INDICES, mode=CombineMode.SUM)
    got_xla = embedding_forward_xla(table, INDICES, mode=CombineMode.SUM)
    assert got_ref.dtype == dt
    assert np.asarray(got_xla).dtype == dt
    np.testing.assert_array_equal(
        np.asarray(got_xla).astype(np.float32), got_ref.astype(np.float32)
    )
