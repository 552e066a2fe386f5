"""EmbeddingTable wrapper: auto-tiering without caller ceremony.

Checks the invariant that matters: lookups return the SAME values
before and after layout refreshes (reordering + remap compose to the
identity on results), for both the device-remap and pipeline-remap
forms, and that training updates applied to the reordered storage stay
consistent.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cuembed_tpu.table import EmbeddingTable
from cuembed_tpu.types import CombineMode


def _make(num_categories=600, width=32, mode=CombineMode.SUM):
    t = EmbeddingTable.create(
        jax.random.key(0), num_categories, width, mode=mode
    )
    return t


def _zipfish(rng, batch, hotness, v):
    u = rng.random((batch, hotness))
    idx = np.minimum((u ** 3 * v).astype(np.int64), v - 1)
    return rng.permutation(v)[idx].astype(np.int32)  # scrambled ids


@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN])
def test_lookup_unchanged_by_refresh(mode):
    rng = np.random.default_rng(0)
    t = _make(mode=mode)
    idx = _zipfish(rng, 64, 8, t.num_categories)
    before = np.asarray(t.lookup(jnp.asarray(idx)))

    t.calibrate(idx)
    after = np.asarray(t.lookup(jnp.asarray(idx)))
    np.testing.assert_allclose(after, before, rtol=2e-5, atol=2e-5)

    # pipeline form: host remap + assume_remapped
    rm = t.remap_indices(idx)
    after2 = np.asarray(
        t.lookup(jnp.asarray(rm), assume_remapped=True)
    )
    np.testing.assert_allclose(after2, before, rtol=2e-5, atol=2e-5)


def test_second_refresh_composes():
    rng = np.random.default_rng(1)
    t = _make()
    idx1 = _zipfish(rng, 64, 8, t.num_categories)
    before = np.asarray(t.lookup(jnp.asarray(idx1)))
    t.calibrate(idx1)

    # drift: a different distribution, then refresh again
    idx2 = _zipfish(rng, 64, 8, t.num_categories)
    t.observe(idx2)
    t.decay(0.5)
    t.observe(idx2)
    t.refresh_layout(idx2)

    after = np.asarray(t.lookup(jnp.asarray(idx1)))
    np.testing.assert_allclose(after, before, rtol=2e-5, atol=2e-5)


def test_csr_lookup_with_remap():
    rng = np.random.default_rng(2)
    t = _make(mode=CombineMode.MEAN)
    offsets = np.array([0, 3, 3, 8, 12], np.int32)
    idx = rng.integers(0, t.num_categories, (16,)).astype(np.int32)
    before = np.asarray(t.lookup(jnp.asarray(idx), offsets=jnp.asarray(offsets)))
    t.calibrate(idx)
    after = np.asarray(t.lookup(jnp.asarray(idx), offsets=jnp.asarray(offsets)))
    np.testing.assert_allclose(after, before, rtol=2e-5, atol=2e-5)


def test_gradients_flow_through_wrapper():
    rng = np.random.default_rng(3)
    t = _make()
    idx = _zipfish(rng, 32, 4, t.num_categories)
    t.calibrate(idx)

    def loss(tab):
        saved = t.table
        t.table = tab
        try:
            out = t.lookup(jnp.asarray(idx))
        finally:
            t.table = saved
        return jnp.sum(out * out)

    g = jax.grad(loss)(t.table)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_refresh_requires_observation():
    t = _make()
    with pytest.raises(ValueError):
        t.refresh_layout()


def test_csr_calibration_uses_live_hotness():
    """CSR calibration derives hotness from offsets[-1], not capacity."""
    import numpy as np
    import jax.numpy as jnp
    from cuembed_tpu.table import EmbeddingTable

    rng = np.random.default_rng(31)
    V, B, W = 4000, 64, 128
    raw = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    t = EmbeddingTable(raw)
    hots = rng.integers(0, 5, B)
    offsets = np.concatenate([[0], np.cumsum(hots)]).astype(np.int32)
    cap = 16 * B  # heavy padding: capacity >> nnz
    flat = rng.integers(0, V, cap).astype(np.int32)
    t.calibrate(flat, offsets)
    out = t.lookup(flat, offsets=jnp.asarray(offsets))
    # parity against the plain path on the same (remapped) storage
    from cuembed_tpu.ref.forward import embedding_forward_ref

    nnz = int(offsets[-1])
    ref = embedding_forward_ref(
        np.asarray(raw), flat[:nnz], offsets=offsets,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=1e-5)


def test_resize_table_grow_and_shrink():
    from cuembed_tpu.table import resize_table

    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.standard_normal((100, 16)).astype(np.float32))
    acc = jnp.asarray(rng.random(100).astype(np.float32))

    # grow with random init: old rows exact, new rows in init range
    big, big_acc = resize_table(t, 150, jax.random.key(0), accum=acc)
    assert big.shape == (150, 16) and big_acc.shape == (150,)
    np.testing.assert_array_equal(np.asarray(big)[:100], np.asarray(t))
    np.testing.assert_array_equal(np.asarray(big_acc)[:100], np.asarray(acc))
    new_rows = np.asarray(big)[100:]
    assert (np.abs(new_rows) <= 1.0 / 4.0 + 1e-6).all()
    assert np.abs(new_rows).sum() > 0  # actually initialized
    np.testing.assert_array_equal(np.asarray(big_acc)[100:], 0.0)

    # grow with zeros (no key)
    z = resize_table(t, 120)
    np.testing.assert_array_equal(np.asarray(z)[100:], 0.0)

    # shrink truncates the tail (coldest rows on an ordered table)
    small = resize_table(t, 60)
    np.testing.assert_array_equal(np.asarray(small), np.asarray(t)[:60])

    # no-op
    same = resize_table(t, 100)
    assert same.shape == (100, 16)
