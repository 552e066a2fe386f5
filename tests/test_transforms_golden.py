"""Golden-value transform tests.

Same 4-nnz fixture as the reference's ``tests/test_embedding_transpose.cu``
(indices {1,3,0,4}, sample_ids {0,0,1,1}, weights {1,.5,1,.5}) plus the
compressed-index and inverse-mapping fixtures from
``tests/test_embedding_backward.cu``.
"""

import numpy as np

from cuembed_tpu import (
    compact_sparse_indices,
    compute_compressed_grad_indices,
    extract_row_ids_for_concat,
    extract_row_ids_from_csr,
    extract_row_ids_from_fixed,
    transpose,
)
from cuembed_tpu.ref import (
    compute_compressed_grad_indices_ref,
    extract_row_ids_for_concat_ref,
    extract_row_ids_from_csr_ref,
    extract_row_ids_from_fixed_ref,
    transpose_ref,
)

INDICES = np.array([1, 3, 0, 4], dtype=np.int32)
SAMPLE_IDS = np.array([0, 0, 1, 1], dtype=np.int32)
WEIGHTS = np.array([1.0, 0.5, 1.0, 0.5], dtype=np.float32)
EXP_T_IDX = np.array([0, 1, 3, 4], dtype=np.int32)
EXP_T_SID = np.array([1, 0, 0, 1], dtype=np.int32)
EXP_T_W = np.array([1.0, 1.0, 0.5, 0.5], dtype=np.float32)


def test_transpose_unweighted():
    for impl in (transpose_ref, transpose):
        t_idx, t_sid, t_w = impl(SAMPLE_IDS, INDICES, None)
        np.testing.assert_array_equal(np.asarray(t_idx), EXP_T_IDX)
        np.testing.assert_array_equal(np.asarray(t_sid), EXP_T_SID)
        assert t_w is None


def test_transpose_weighted():
    for impl in (transpose_ref, transpose):
        t_idx, t_sid, t_w = impl(SAMPLE_IDS, INDICES, WEIGHTS)
        np.testing.assert_array_equal(np.asarray(t_idx), EXP_T_IDX)
        np.testing.assert_array_equal(np.asarray(t_sid), EXP_T_SID)
        np.testing.assert_array_equal(np.asarray(t_w), EXP_T_W)


def test_row_ids_fixed():
    np.testing.assert_array_equal(
        extract_row_ids_from_fixed_ref(3, 2), np.array([0, 0, 1, 1, 2, 2])
    )
    np.testing.assert_array_equal(
        np.asarray(extract_row_ids_from_fixed(3, 2)), np.array([0, 0, 1, 1, 2, 2])
    )


def test_row_ids_csr():
    offsets = np.array([0, 2, 2, 5], dtype=np.int32)
    expected = np.array([0, 0, 2, 2, 2], dtype=np.int32)
    np.testing.assert_array_equal(extract_row_ids_from_csr_ref(offsets), expected)
    idx = np.zeros(5, dtype=np.int32)
    np.testing.assert_array_equal(
        np.asarray(extract_row_ids_from_csr(offsets, idx)), expected
    )


def test_row_ids_concat():
    np.testing.assert_array_equal(
        extract_row_ids_for_concat_ref(4), np.arange(4, dtype=np.int32)
    )
    np.testing.assert_array_equal(
        np.asarray(extract_row_ids_for_concat(4)), np.arange(4, dtype=np.int32)
    )


def test_compressed_grad_indices():
    """Fixture from test_embedding_backward.cu: {0,1,3,3} -> {0,1,2,2}."""
    sorted_idx = np.array([0, 1, 3, 3], dtype=np.int32)
    expected = np.array([0, 1, 2, 2], dtype=np.int32)
    np.testing.assert_array_equal(
        compute_compressed_grad_indices_ref(sorted_idx), expected
    )
    np.testing.assert_array_equal(
        np.asarray(compute_compressed_grad_indices(sorted_idx)), expected
    )


def test_compact_sparse_indices():
    """Inverse mapping fixture: sorted {0,1,3,3} remapped {0,1,2,2} -> {0,1,3}."""
    sorted_idx = np.array([0, 1, 3, 3], dtype=np.int32)
    remapped = np.array([0, 1, 2, 2], dtype=np.int32)
    inv = np.asarray(compact_sparse_indices(sorted_idx, remapped))
    np.testing.assert_array_equal(inv[:3], np.array([0, 1, 3], dtype=np.int32))


def test_transpose_random_parity():
    """Randomized parity: jitted transpose vs numpy golden, with duplicates.

    Sample-id order within an equal-index run is compared via per-run
    multisets, mirroring the reference's run-sum comparison discipline
    (test_embedding_against_cpu.cu:174-206).
    """
    rng = np.random.default_rng(7)
    nnz = 513
    idx = rng.integers(0, 37, nnz).astype(np.int32)
    sid = rng.integers(0, 100, nnz).astype(np.int32)
    w = rng.random(nnz).astype(np.float32)
    r_idx, r_sid, r_w = transpose_ref(sid, idx, w)
    j_idx, j_sid, j_w = transpose(sid, idx, w)
    np.testing.assert_array_equal(np.asarray(j_idx), r_idx)
    # Within-run (sample_id, weight) multisets must agree.
    for run in np.unique(r_idx):
        m = r_idx == run
        ref_pairs = sorted(zip(r_sid[m].tolist(), r_w[m].tolist()))
        got_pairs = sorted(
            zip(np.asarray(j_sid)[m].tolist(), np.asarray(j_w)[m].tolist())
        )
        assert ref_pairs == got_pairs
