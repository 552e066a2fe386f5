"""Allocation invariant tests, mirroring ``tests/test_embedding_allocation.cu:56-135``:

buffer sizes vs options (CSR => nnz == offsets[-1], concat => result rows ×
hotness, ...), per-sample index uniqueness, weight values ∈ {0.5, 0.25}.
"""

import numpy as np
import pytest

from cuembed_tpu import CombineMode
from cuembed_tpu.utils import AllocationOptions, allocate

BASE = AllocationOptions(
    num_categories=500, batch_size=64, hotness=8, embed_width=12, alpha=1.05
)


def test_fixed_shapes():
    a = allocate(BASE)
    assert a.table.shape == (500, 12)
    assert a.indices.shape == (64, 8)
    assert a.offsets is None and a.weights is None
    assert a.nnz == 64 * 8
    assert a.grad_y.shape == (64, 12)
    assert a.transpose_indices.shape == (a.nnz,)
    assert np.all(np.diff(a.transpose_indices) >= 0)  # sorted


def test_csr_shapes():
    a = allocate(BASE.with_(is_csr=True))
    assert a.offsets.shape == (65,)
    assert a.offsets[0] == 0
    assert a.indices.shape == (int(a.offsets[-1]),)
    per_sample = np.diff(a.offsets)
    assert per_sample.min() >= 0 and per_sample.max() <= 8


def test_concat_shapes():
    a = allocate(BASE.with_(combine_mode=CombineMode.CONCAT))
    assert a.grad_y.shape == (64 * 8, 12)
    # Concat sample ids are the identity sequence.
    np.testing.assert_array_equal(a.sample_ids, np.arange(a.nnz, dtype=np.int32))


def test_weights_values():
    a = allocate(BASE.with_(is_weighted=True))
    assert a.weights.shape == a.indices.shape
    assert set(np.unique(a.weights)) <= {0.25, 0.5}


def test_per_sample_uniqueness_and_range():
    a = allocate(BASE)
    assert a.indices.min() >= 1  # 0 reserved
    assert a.indices.max() < 500
    for row in a.indices:
        assert np.unique(row).size == row.size


def test_compressed_grad_arrays():
    a = allocate(BASE.with_(compressed_grad=True))
    assert a.transpose_remapped_indices is not None
    assert int(a.transpose_remapped_indices[-1]) + 1 == a.num_unique
    # remapped ids are a non-decreasing dense cover of 0..num_unique-1
    d = np.diff(a.transpose_remapped_indices)
    assert set(np.unique(d)) <= {0, 1}


def test_grad_y_integer_valued():
    a = allocate(BASE)
    assert np.array_equal(a.grad_y, np.round(a.grad_y))
    assert a.grad_y.min() >= -10 and a.grad_y.max() <= 10


def test_validation_errors():
    with pytest.raises(ValueError):
        allocate(BASE.with_(is_csr=True, combine_mode=CombineMode.CONCAT))
    with pytest.raises(ValueError):
        allocate(BASE.with_(is_weighted=True, combine_mode=CombineMode.MEAN))
