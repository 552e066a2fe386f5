"""Quotient-remainder compositional embeddings: parity vs the composed
full table, complementary-partition property, gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuembed_tpu import CombineMode, embedding_lookup, embedding_lookup_csr
from cuembed_tpu.models import QREmbeddingBag


def _composed_table(params, bag):
    """The full [V, W] table QR implicitly represents."""
    q = np.asarray(params["q"])
    r = np.asarray(params["r"])
    ids = np.arange(bag.num_categories)
    if bag.operation == "add":
        return q[ids // bag.num_buckets] + r[ids % bag.num_buckets]
    return q[ids // bag.num_buckets] * r[ids % bag.num_buckets]


@pytest.mark.parametrize("operation", ["add", "mult"])
@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN])
def test_qr_matches_composed_table(operation, mode):
    rng = np.random.default_rng(0)
    V, W, Q, B, H = 1000, 16, 37, 24, 4
    bag = QREmbeddingBag(V, W, Q, operation=operation, mode=mode)
    params = bag.init(jax.random.key(0))
    idx = jnp.asarray(rng.integers(0, V, (B, H)).astype(np.int32))
    got = bag.apply(params, idx)
    full = jnp.asarray(_composed_table(params, bag))
    want = embedding_lookup(full, idx, mode=mode, backend="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("operation", ["add", "mult"])
def test_qr_weighted_sum(operation):
    rng = np.random.default_rng(1)
    V, W, Q, B, H = 500, 8, 16, 12, 3
    bag = QREmbeddingBag(V, W, Q, operation=operation)
    params = bag.init(jax.random.key(1))
    idx = jnp.asarray(rng.integers(0, V, (B, H)).astype(np.int32))
    w = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    got = bag.apply(params, idx, w)
    full = jnp.asarray(_composed_table(params, bag))
    want = embedding_lookup(full, idx, w, backend="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_qr_csr_add():
    rng = np.random.default_rng(2)
    V, W, Q, B = 300, 8, 11, 16
    bag = QREmbeddingBag(V, W, Q, mode=CombineMode.MEAN)
    params = bag.init(jax.random.key(2))
    hots = rng.integers(0, 5, B)
    offs = np.concatenate([[0], np.cumsum(hots)]).astype(np.int32)
    vals = rng.integers(0, V, max(int(offs[-1]), 1)).astype(np.int32)
    got = bag.apply(
        params, jnp.asarray(vals), offsets=jnp.asarray(offs)
    )
    full = jnp.asarray(_composed_table(params, bag))
    want = embedding_lookup_csr(
        full, jnp.asarray(vals), jnp.asarray(offs), mode=CombineMode.MEAN
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_qr_csr_mult_raises():
    bag = QREmbeddingBag(100, 8, 10, operation="mult")
    params = bag.init(jax.random.key(0))
    with pytest.raises(ValueError, match="fixed-hotness"):
        bag.apply(
            params, jnp.zeros((4,), jnp.int32),
            offsets=jnp.asarray([0, 1, 2, 3, 4], jnp.int32),
        )


def test_qr_complementary_partitions():
    """Distinct ids always map to distinct (quotient, remainder) pairs."""
    V, Q = 1000, 37
    ids = np.arange(V)
    pairs = set(zip(ids // Q, ids % Q))
    assert len(pairs) == V


def test_qr_memory_savings():
    bag = QREmbeddingBag(10_000_000, 64, 4096)
    full_rows = bag.num_categories
    qr_rows = bag.num_quotients + bag.num_buckets
    assert qr_rows < full_rows / 1000


def test_qr_is_differentiable():
    rng = np.random.default_rng(3)
    V, W, Q, B, H = 200, 8, 9, 8, 3
    bag = QREmbeddingBag(V, W, Q)
    params = bag.init(jax.random.key(3))
    idx = jnp.asarray(rng.integers(0, V, (B, H)).astype(np.int32))

    def loss(p):
        return jnp.sum(bag.apply(p, idx) ** 2)

    g = jax.grad(loss)(params)
    assert g["q"].shape == params["q"].shape
    assert g["r"].shape == params["r"].shape
    assert float(jnp.abs(g["q"]).sum()) > 0
    assert float(jnp.abs(g["r"]).sum()) > 0


def test_qr_validation():
    with pytest.raises(ValueError, match="num_buckets"):
        QREmbeddingBag(100, 8, 0)
    with pytest.raises(ValueError, match="operation"):
        QREmbeddingBag(100, 8, 10, operation="cat")
    with pytest.raises(ValueError, match="CONCAT"):
        QREmbeddingBag(100, 8, 10, mode=CombineMode.CONCAT)


def test_qr_oversized_buckets_rejected():
    with pytest.raises(ValueError, match="num_buckets"):
        QREmbeddingBag(10_000, 64, 1_000_000)
