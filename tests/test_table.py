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


# ---------------------------------------------------------------------------
# use_natural_order: the zero-ceremony fast path for hot-first id spaces
# ---------------------------------------------------------------------------


def _force_tpu_dispatch(monkeypatch):
    """Make dispatch believe it's on TPU so tiered_cfg engages (the
    tiered engine itself runs fine on CPU — test_tiered.py covers it)."""
    from cuembed_tpu.ops import dispatch

    monkeypatch.setattr(dispatch, "_on_tpu", lambda: True)


@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN])
def test_use_natural_order_values_unchanged(monkeypatch, mode):
    """Natural-order tiering must be value-identical to the plain path
    (correctness is unconditional; only speed depends on the claim)."""
    _force_tpu_dispatch(monkeypatch)
    rng = np.random.default_rng(7)
    t = EmbeddingTable.create(
        jax.random.key(0), 600, 32, mode=mode, layout="raw", hot_bytes=4096,
        vmem_table_bytes=1024,  # force tiering on a test-sized table
    )
    # hot-first ids: low ids dominate (the natural-order contract)
    idx = np.minimum(
        (rng.random((64, 8)) ** 3 * 600).astype(np.int64), 599
    ).astype(np.int32)
    before = np.asarray(t.lookup(jnp.asarray(idx)))

    t.use_natural_order(calibration_indices=idx)
    assert t.tiered_cfg is not None and t.remap is None
    after = np.asarray(t.lookup(jnp.asarray(idx)))
    np.testing.assert_allclose(after, before, rtol=2e-5, atol=2e-5)

    # ids that are NOT hot-first still return exact values (only slower)
    cold = rng.integers(0, 600, (16, 8)).astype(np.int32)
    np.testing.assert_allclose(
        np.asarray(t.lookup(jnp.asarray(cold))),
        np.asarray(
            EmbeddingTable(t.table, mode=mode, layout="raw").lookup(
                jnp.asarray(cold)
            )
        ),
        rtol=2e-5, atol=2e-5,
    )


def test_use_natural_order_csr(monkeypatch):
    _force_tpu_dispatch(monkeypatch)
    rng = np.random.default_rng(8)
    t = EmbeddingTable.create(
        jax.random.key(1), 500, 32, layout="raw", hot_bytes=4096,
        vmem_table_bytes=1024,
    )
    hots = rng.integers(0, 6, 48)
    offs = np.concatenate([[0], np.cumsum(hots)]).astype(np.int32)
    vals = np.minimum(
        (rng.random(int(offs[-1])) ** 3 * 500).astype(np.int64), 499
    ).astype(np.int32)
    before = np.asarray(
        t.lookup(jnp.asarray(vals), offsets=jnp.asarray(offs))
    )
    t.use_natural_order(
        calibration_indices=vals, calibration_offsets=offs
    )
    assert t.tiered_cfg is not None
    after = np.asarray(
        t.lookup(jnp.asarray(vals), offsets=jnp.asarray(offs))
    )
    np.testing.assert_allclose(after, before, rtol=2e-5, atol=2e-5)


def test_use_natural_order_refuses_after_reorder():
    rng = np.random.default_rng(9)
    t = EmbeddingTable.create(
        jax.random.key(2), 400, 16, layout="raw", vmem_table_bytes=1024,
    )
    idx = rng.integers(0, 400, (32, 4)).astype(np.int32)
    t.calibrate(idx)
    assert t.remap is not None
    with pytest.raises(ValueError, match="already reordered"):
        t.use_natural_order()


def test_refresh_layout_supersedes_natural_order():
    rng = np.random.default_rng(10)
    t = EmbeddingTable.create(
        jax.random.key(3), 400, 16, layout="raw", vmem_table_bytes=1024,
    )
    t.use_natural_order(hotness=4)
    assert t._natural_order
    idx = rng.integers(0, 400, (32, 4)).astype(np.int32)
    t.calibrate(idx)
    assert not t._natural_order  # measured reorder wins
    assert t.remap is not None


def test_int8_head_after_natural_order(monkeypatch):
    """enable_int8_head accepts the natural-order layout (no remap)."""
    _force_tpu_dispatch(monkeypatch)
    rng = np.random.default_rng(11)
    t = EmbeddingTable.create(
        jax.random.key(4), 600, 128, layout="raw", hot_bytes=16384,
        vmem_table_bytes=1024,
    )
    idx = np.minimum(
        (rng.random((64, 8)) ** 3 * 600).astype(np.int64), 599
    ).astype(np.int32)
    exact = np.asarray(t.lookup(jnp.asarray(idx)))
    t.use_natural_order(calibration_indices=idx)
    t.enable_int8_head(calibration_indices=idx)
    lossy = np.asarray(t.lookup(jnp.asarray(idx), use_int8_head=True))
    np.testing.assert_allclose(lossy, exact, rtol=0.02, atol=0.05)


# ---------------------------------------------------------------------------
# the one-time slow-path hint in auto dispatch
# ---------------------------------------------------------------------------


def test_slow_path_hint_fires_once(monkeypatch):
    import warnings as _w

    from cuembed_tpu import embedding_lookup
    from cuembed_tpu.ops import dispatch

    monkeypatch.setattr(dispatch, "_on_tpu", lambda: True)
    dispatch._slow_path_hinted.clear()
    # > the 108 MB VMEM budget => tiered_auto_config is non-None
    table = jnp.zeros((250_000, 128), jnp.float32)
    idx = jnp.zeros((4, 2), jnp.int32)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        embedding_lookup(table, idx)
    msgs = [str(r.message) for r in rec if "tiered engine" in str(r.message)]
    assert len(msgs) == 1 and "EmbeddingTable" in msgs[0]

    # second call on the same table: silent
    with _w.catch_warnings(record=True) as rec2:
        _w.simplefilter("always")
        embedding_lookup(table, idx)
    assert not [r for r in rec2 if "tiered engine" in str(r.message)]
    dispatch._slow_path_hinted.clear()


def test_slow_path_hint_silent_when_ceremony_done(monkeypatch):
    import warnings as _w

    from cuembed_tpu.ops import dispatch

    monkeypatch.setattr(dispatch, "_on_tpu", lambda: True)
    dispatch._slow_path_hinted.clear()
    t = EmbeddingTable.create(
        jax.random.key(5), 600, 32, layout="raw", hot_bytes=4096,
        vmem_table_bytes=1024,
    )
    t.use_natural_order(hotness=8)
    idx = jnp.zeros((4, 8), jnp.int32)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        t.lookup(idx)
    assert not [r for r in rec if "tiered engine" in str(r.message)]
    dispatch._slow_path_hinted.clear()
