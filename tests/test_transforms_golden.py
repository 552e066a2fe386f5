"""Golden-value transform tests.

Same 4-nnz fixture as the reference's ``tests/test_embedding_transpose.cu``
(indices {1,3,0,4}, sample_ids {0,0,1,1}, weights {1,.5,1,.5}) plus the
compressed-index and inverse-mapping fixtures from
``tests/test_embedding_backward.cu``.
"""

import numpy as np
import pytest

import jax.numpy as jnp

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


# ---------------------------------------------------------------------------
# Round-5: compacted masked transpose (the backward's sort diet)
# ---------------------------------------------------------------------------


def _masked_coo(rng, n, head, V, hotness=8):
    import numpy as np

    idx = rng.integers(0, V, n).astype(np.int32)
    sentinel = np.iinfo(np.int32).max
    masked = np.where(idx < head, sentinel, idx)
    sids = (np.arange(n, dtype=np.int32) // hotness)
    return masked, sids


@pytest.mark.parametrize("weighted", [False, True])
def test_transpose_masked_compact_matches_plain(weighted):
    import numpy as np

    from cuembed_tpu.ops.transforms import (
        transpose,
        transpose_masked_compact,
    )

    rng = np.random.default_rng(61)
    n, head, V, E = 1024, 40, 400, 64
    masked, sids = _masked_coo(rng, n, head, V)
    w = rng.standard_normal(n).astype(np.float32) if weighted else None
    slots = 56  # comfortably above the ~nonhead count per 64-chunk

    ref = transpose(jnp.asarray(sids), jnp.asarray(masked),
                    None if w is None else jnp.asarray(w))
    out = transpose_masked_compact(
        jnp.asarray(sids), jnp.asarray(masked),
        None if w is None else jnp.asarray(w),
        chunk_elems=E, nonhead_slots=slots,
    )
    sentinel = np.iinfo(np.int32).max
    live = np.asarray(ref[0]) != sentinel
    k = int(live.sum())
    # identical content for every non-sentinel entry; sentinel entries'
    # payloads are unspecified by contract
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(
        np.asarray(out[1])[:k], np.asarray(ref[1])[:k]
    )
    if weighted:
        np.testing.assert_array_equal(
            np.asarray(out[2])[:k], np.asarray(ref[2])[:k]
        )


def test_transpose_masked_compact_overflow_falls_back():
    import numpy as np

    from cuembed_tpu.ops.transforms import (
        transpose,
        transpose_masked_compact,
    )

    rng = np.random.default_rng(67)
    n, head, V, E = 1024, 2, 400, 64  # nearly everything non-head
    masked, sids = _masked_coo(rng, n, head, V)
    ref = transpose(jnp.asarray(sids), jnp.asarray(masked), None)
    out = transpose_masked_compact(
        jnp.asarray(sids), jnp.asarray(masked), None,
        chunk_elems=E, nonhead_slots=16,  # every chunk overflows
    )
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(ref[1]))


def test_transpose_masked_compact_degenerate_gates():
    import numpy as np

    from cuembed_tpu.ops.transforms import (
        transpose,
        transpose_masked_compact,
    )

    rng = np.random.default_rng(71)
    masked, sids = _masked_coo(rng, 100, 10, 200)  # n < 4 * chunk
    ref = transpose(jnp.asarray(sids), jnp.asarray(masked), None)
    for slots in (0, 63):  # disabled / would-not-compress
        out = transpose_masked_compact(
            jnp.asarray(sids), jnp.asarray(masked), None,
            chunk_elems=64, nonhead_slots=slots,
        )
        np.testing.assert_array_equal(np.asarray(out[0]),
                                      np.asarray(ref[0]))
        np.testing.assert_array_equal(np.asarray(out[1]),
                                      np.asarray(ref[1]))


def test_sgd_tiered_uses_compact_transpose_exactly():
    """End-to-end: the tiered sparse SGD step through the compacted
    transpose equals the dense-gradient step at a size that takes the
    fast path (n >= 4 * chunk)."""
    import numpy as np

    from cuembed_tpu.ops.tiered import TieredConfig
    from cuembed_tpu.train import sgd_sparse_update
    from cuembed_tpu.types import CombineMode

    rng = np.random.default_rng(73)
    V, W, B, H = 500, 16, 64, 8  # nnz = 512 = 8 chunks of 64
    table = jnp.asarray(rng.standard_normal((V, W)), jnp.float32)
    idx = jnp.asarray(
        np.where(
            rng.random((B, H)) < 0.5,
            rng.integers(0, 32, (B, H)),
            rng.integers(32, V, (B, H)),
        ).astype(np.int32)
    )
    gy = jnp.asarray(rng.standard_normal((B, W)), jnp.float32)
    cfg = TieredConfig(
        hot_rows=128, chunk_elems=64, cold_slots=24,
        mxu_head_rows=32, mid_slots=32,
    )
    new = sgd_sparse_update(table, idx, gy, lr=0.1, tiered_cfg=cfg)

    # dense reference
    onehot = (
        idx.reshape(-1)[:, None] == jnp.arange(V, dtype=jnp.int32)
    ).astype(jnp.float32)
    dense_grad = jnp.einsum(
        "nv,nw->vw", onehot,
        jnp.repeat(gy, H, axis=0),
    )
    ref = table - 0.1 * dense_grad
    np.testing.assert_allclose(
        np.asarray(new), np.asarray(ref), rtol=2e-4, atol=2e-4
    )
