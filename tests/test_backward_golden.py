"""Golden-value backward tests.

The exact COO fixture from the reference's
``tests/test_embedding_backward.cu:161-206``: width 4, 5-category table,
nnz 4 with a duplicate index run, expected full + compressed gradients for
sum/concat × weighted, plus the inverse mapping and skip_grad_init cases.
"""

import numpy as np
import pytest

from cuembed_tpu import (
    embedding_backward_compressed_xla,
    embedding_backward_xla,
)
from cuembed_tpu.ref import embedding_backward_ref

WIDTH = 4
NUM_CATEGORIES = 5
T_IDX = np.array([0, 1, 3, 3], dtype=np.int32)
T_REMAPPED = np.array([0, 1, 2, 2], dtype=np.int32)
T_SID = np.array([1, 0, 0, 1], dtype=np.int32)
T_SID_CONCAT = np.array([2, 0, 1, 3], dtype=np.int32)
T_WEIGHTS = np.array([3.0, 1.0, 0.5, 3.0], dtype=np.float32)
GRAD_Y_SUM = np.arange(1.0, 9.0, dtype=np.float32).reshape(2, 4)
GRAD_Y_CONCAT = np.arange(1.0, 17.0, dtype=np.float32).reshape(4, 4)

REF_FULL = {
    ("sum", False): np.array(
        [[5, 6, 7, 8], [1, 2, 3, 4], [0, 0, 0, 0], [6, 8, 10, 12], [0, 0, 0, 0]],
        dtype=np.float32,
    ),
    ("sum", True): np.array(
        [[15, 18, 21, 24], [1, 2, 3, 4], [0, 0, 0, 0], [15.5, 19, 22.5, 26], [0, 0, 0, 0]],
        dtype=np.float32,
    ),
    ("concat", False): np.array(
        [[9, 10, 11, 12], [1, 2, 3, 4], [0, 0, 0, 0], [18, 20, 22, 24], [0, 0, 0, 0]],
        dtype=np.float32,
    ),
    ("concat", True): np.array(
        [[27, 30, 33, 36], [1, 2, 3, 4], [0, 0, 0, 0], [41.5, 45, 48.5, 52], [0, 0, 0, 0]],
        dtype=np.float32,
    ),
}
REF_INVERSE_MAPPING = np.array([0, 1, 3], dtype=np.int32)
REF_COMPRESSED = {
    ("sum", False): REF_FULL[("sum", False)][[0, 1, 3]],
    ("sum", True): REF_FULL[("sum", True)][[0, 1, 3]],
    ("concat", False): REF_FULL[("concat", False)][[0, 1, 3]],
    ("concat", True): REF_FULL[("concat", True)][[0, 1, 3]],
}


def _inputs(mode, weighted):
    grad_y = GRAD_Y_CONCAT if mode == "concat" else GRAD_Y_SUM
    sid = T_SID_CONCAT if mode == "concat" else T_SID
    w = T_WEIGHTS if weighted else None
    return grad_y, sid, w


@pytest.mark.parametrize("mode", ["sum", "concat"])
@pytest.mark.parametrize("weighted", [False, True])
def test_full_grad_ref(mode, weighted):
    grad_y, sid, w = _inputs(mode, weighted)
    got, _ = embedding_backward_ref(
        grad_y, NUM_CATEGORIES, T_IDX, sid, transpose_weights=w
    )
    np.testing.assert_array_equal(got, REF_FULL[(mode, weighted)])


@pytest.mark.parametrize("mode", ["sum", "concat"])
@pytest.mark.parametrize("weighted", [False, True])
def test_full_grad_xla(mode, weighted):
    grad_y, sid, w = _inputs(mode, weighted)
    got = embedding_backward_xla(grad_y, NUM_CATEGORIES, T_IDX, sid, w)
    np.testing.assert_array_equal(np.asarray(got), REF_FULL[(mode, weighted)])


@pytest.mark.parametrize("mode", ["sum", "concat"])
@pytest.mark.parametrize("weighted", [False, True])
def test_compressed_grad_ref(mode, weighted):
    grad_y, sid, w = _inputs(mode, weighted)
    got, inv = embedding_backward_ref(
        grad_y,
        3,
        T_IDX,
        sid,
        transpose_remapped_indices=T_REMAPPED,
        transpose_weights=w,
    )
    np.testing.assert_array_equal(got, REF_COMPRESSED[(mode, weighted)])
    np.testing.assert_array_equal(inv, REF_INVERSE_MAPPING)


@pytest.mark.parametrize("mode", ["sum", "concat"])
@pytest.mark.parametrize("weighted", [False, True])
def test_compressed_grad_xla(mode, weighted):
    grad_y, sid, w = _inputs(mode, weighted)
    got = embedding_backward_compressed_xla(grad_y, T_IDX, sid, w)
    assert int(got.num_unique) == 3
    np.testing.assert_array_equal(
        np.asarray(got.rows)[:3], REF_COMPRESSED[(mode, weighted)]
    )
    np.testing.assert_array_equal(
        np.asarray(got.unique_indices)[:3], REF_INVERSE_MAPPING
    )
    # Padding rows are exactly zero.
    np.testing.assert_array_equal(
        np.asarray(got.rows)[3:], np.zeros((1, WIDTH), np.float32)
    )


def test_skip_grad_init_ref():
    """skip_grad_init accumulates into the provided buffer (cpu ref:125-128)."""
    grad_y, sid, w = _inputs("sum", False)
    base = np.ones((NUM_CATEGORIES, WIDTH), dtype=np.float32)
    got, _ = embedding_backward_ref(
        grad_y, NUM_CATEGORIES, T_IDX, sid, skip_grad_init=True, grad_out=base
    )
    np.testing.assert_array_equal(got, REF_FULL[("sum", False)] + 1.0)


def test_backward_with_padding():
    """Padded COO tail (nnz < capacity) contributes nothing."""
    pad = np.iinfo(np.int32).max
    t_idx = np.concatenate([T_IDX, [pad, pad]]).astype(np.int32)
    t_sid = np.concatenate([T_SID, [0, 1]]).astype(np.int32)
    got = embedding_backward_xla(
        GRAD_Y_SUM, NUM_CATEGORIES, t_idx, t_sid, None, nnz=np.int32(4)
    )
    np.testing.assert_array_equal(np.asarray(got), REF_FULL[("sum", False)])


def test_backward_empty():
    got = embedding_backward_compressed_xla(
        GRAD_Y_SUM,
        np.full(4, np.iinfo(np.int32).max, np.int32),
        np.zeros(4, np.int32),
        None,
        nnz=np.int32(0),
    )
    assert int(got.num_unique) == 0
    np.testing.assert_array_equal(np.asarray(got.rows), np.zeros((4, 4), np.float32))


# ---------------------------------------------------------------------------
# Round-5: live-capacity bounded backward (sentinels sort last)
# ---------------------------------------------------------------------------


def _sorted_coo_with_padding(rng, nnz_live, cap, V, batch):
    import numpy as np

    sentinel = np.iinfo(np.int32).max
    idx = np.full(cap, sentinel, np.int32)
    idx[:nnz_live] = rng.integers(0, V, nnz_live)
    sid = np.zeros(cap, np.int32)
    sid[:nnz_live] = rng.integers(0, batch, nnz_live)
    order = np.argsort(idx, kind="stable")
    return idx[order], sid[order]


@pytest.mark.parametrize("weighted", [False, True])
def test_backward_xla_live_cap_matches(weighted):
    import jax.numpy as jnp
    import numpy as np

    from cuembed_tpu.ops.lookup_xla import embedding_backward_xla

    rng = np.random.default_rng(83)
    V, W, batch, nnz_live, cap = 300, 16, 32, 200, 512
    t_i, t_s = _sorted_coo_with_padding(rng, nnz_live, cap, V, batch)
    w = None
    if weighted:
        w = np.zeros(cap, np.float32)
        w[t_i != np.iinfo(np.int32).max] = rng.standard_normal(nnz_live)
    gy = rng.standard_normal((batch, W)).astype(np.float32)

    ref = embedding_backward_xla(
        jnp.asarray(gy), V, jnp.asarray(t_i), jnp.asarray(t_s),
        None if w is None else jnp.asarray(w), nnz=jnp.int32(nnz_live),
    )
    # fast path: live_cap above the live count
    fast = embedding_backward_xla(
        jnp.asarray(gy), V, jnp.asarray(t_i), jnp.asarray(t_s),
        None if w is None else jnp.asarray(w), nnz=jnp.int32(nnz_live),
        live_cap=256,
    )
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    # overflow: live_cap below the live count -> cond to full width
    over = embedding_backward_xla(
        jnp.asarray(gy), V, jnp.asarray(t_i), jnp.asarray(t_s),
        None if w is None else jnp.asarray(w), nnz=jnp.int32(nnz_live),
        live_cap=64,
    )
    np.testing.assert_allclose(np.asarray(over), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_backward_compressed_live_cap_matches():
    import jax.numpy as jnp
    import numpy as np

    from cuembed_tpu.ops.lookup_xla import (
        embedding_backward_compressed_xla,
    )

    rng = np.random.default_rng(89)
    V, W, batch, nnz_live, cap = 300, 16, 32, 200, 512
    t_i, t_s = _sorted_coo_with_padding(rng, nnz_live, cap, V, batch)
    gy = rng.standard_normal((batch, W)).astype(np.float32)

    ref = embedding_backward_compressed_xla(
        jnp.asarray(gy), jnp.asarray(t_i), jnp.asarray(t_s), None,
        nnz=jnp.int32(nnz_live),
    )
    for lc in (256, 64):  # fast path / overflow fallback
        got = embedding_backward_compressed_xla(
            jnp.asarray(gy), jnp.asarray(t_i), jnp.asarray(t_s), None,
            nnz=jnp.int32(nnz_live), live_cap=lc,
        )
        assert got.rows.shape == ref.rows.shape  # capacity preserved
        assert int(got.num_unique) == int(ref.num_unique)
        nu = int(ref.num_unique)
        np.testing.assert_allclose(
            np.asarray(got.rows)[:nu], np.asarray(ref.rows)[:nu],
            rtol=1e-6, atol=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(got.unique_indices)[:nu],
            np.asarray(ref.unique_indices)[:nu],
        )
