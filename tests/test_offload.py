"""Host-offloaded table: exact parity with a device-resident table.

The hot/cold split is a placement, not an approximation — lookup and
both sparse updates must match the single-table ops on the
concatenated (head + tail) table.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cuembed_tpu import CombineMode, embedding_lookup
from cuembed_tpu.offload import HostOffloadTable
from cuembed_tpu.train import (
    rowwise_adagrad_sparse_update,
    sgd_sparse_update,
)


def _setup(rng, V=1024, hot=256, W=16, B=32, H=4):
    table = rng.standard_normal((V, W)).astype(np.float32)
    # skew toward the head, but touch the tail too
    idx = np.where(
        rng.random((B, H)) < 0.7,
        rng.integers(0, hot, (B, H)),
        rng.integers(hot, V, (B, H)),
    ).astype(np.int32)
    off = HostOffloadTable(table, hot, cold_cap=B * H)
    return table, idx, off


@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN])
def test_offload_lookup_matches_resident(mode):
    rng = np.random.default_rng(0)
    table, idx, off = _setup(rng)
    got = off.lookup(off.prepare(idx), mode=mode)
    want = embedding_lookup(
        jnp.asarray(table), jnp.asarray(idx), mode=mode, backend="xla"
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_offload_lookup_weighted():
    rng = np.random.default_rng(1)
    table, idx, off = _setup(rng)
    w = rng.standard_normal(idx.shape).astype(np.float32)
    got = off.lookup(off.prepare(idx, w))
    want = embedding_lookup(
        jnp.asarray(table), jnp.asarray(idx), jnp.asarray(w),
        backend="xla",
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_offload_sgd_matches_resident():
    rng = np.random.default_rng(2)
    table, idx, off = _setup(rng)
    gy = rng.standard_normal((32, 16)).astype(np.float32)
    want = sgd_sparse_update(
        jnp.asarray(table), jnp.asarray(idx), jnp.asarray(gy), lr=0.1
    )
    off.sgd_update(off.prepare(idx), jnp.asarray(gy), lr=0.1)
    np.testing.assert_allclose(
        off.full_table(), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_offload_adagrad_matches_resident_two_steps():
    rng = np.random.default_rng(3)
    table, idx, off = _setup(rng)
    gy = rng.standard_normal((32, 16)).astype(np.float32)
    want_t = jnp.asarray(table)
    want_a = jnp.zeros((1024,), jnp.float32)
    off.adagrad_init()
    for _ in range(2):
        want_t, want_a = rowwise_adagrad_sparse_update(
            want_t, want_a, jnp.asarray(idx), jnp.asarray(gy), lr=0.1
        )
        off.adagrad_update(off.prepare(idx), jnp.asarray(gy), lr=0.1)
    np.testing.assert_allclose(
        off.full_table(), np.asarray(want_t), rtol=1e-4, atol=1e-5
    )
    got_a = np.concatenate(
        [np.asarray(off.head_accum), off.tail_accum]
    )
    np.testing.assert_allclose(
        got_a, np.asarray(want_a), rtol=1e-4, atol=1e-6
    )


def test_offload_cold_cap_overflow_raises():
    rng = np.random.default_rng(4)
    table = rng.standard_normal((1024, 16)).astype(np.float32)
    off = HostOffloadTable(table, 256, cold_cap=8)
    idx = np.arange(256, 256 + 64, dtype=np.int32).reshape(16, 4)
    with pytest.raises(ValueError, match="cold_cap"):
        off.prepare(idx)


def test_offload_traffic_is_unique_cold_rows_only():
    """Shipped bytes scale with unique cold rows, not nnz or tail size:
    duplicated cold ids occupy one slot."""
    rng = np.random.default_rng(5)
    table = rng.standard_normal((100_000, 16)).astype(np.float32)
    off = HostOffloadTable(table, 256, cold_cap=8)
    idx = np.full((64, 4), 50_000, np.int32)  # one cold row, many times
    batch = off.prepare(idx)
    assert batch.uniq_cold.shape[0] == 1
    got = off.lookup(batch)
    want = embedding_lookup(
        jnp.asarray(table), jnp.asarray(idx), backend="xla"
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_offload_pipeline_integration():
    """prepare() runs on the input-pipeline thread; the consumer only
    sees device-ready batches."""
    from cuembed_tpu.utils.pipeline import InputPipeline

    rng = np.random.default_rng(6)
    table, _, off = _setup(rng)
    it = iter(
        rng.integers(0, 1024, (32, 4)).astype(np.int32) for _ in range(4)
    )
    with InputPipeline(lambda: off.prepare(next(it)), depth=2) as pipe:
        for _ in range(4):
            batch = pipe.get()
            out = off.lookup(batch)
            assert np.isfinite(np.asarray(out)).all()
