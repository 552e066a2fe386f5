"""Sharded-CSR layouts: data-axis CSR sharding + CSR all-to-all routing.

CSR batches previously replicated across the data axis
(``sharded_lookup.py``); the sharded-CSR layout (``shard_csr`` blocks)
shards them like fixed-hotness batches. Verified on the virtual
8-device CPU mesh against the unsharded single-device result.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cuembed_tpu.ops.api import embedding_lookup_csr
from cuembed_tpu.parallel.alltoall_lookup import alltoall_row_sharded_lookup
from cuembed_tpu.parallel.sharded_lookup import row_sharded_lookup
from cuembed_tpu.parallel.sharding import make_mesh, shard_csr
from cuembed_tpu.types import CombineMode

pytestmark = pytest.mark.skipif(
    jax.device_count() < 2, reason="needs a multi-device mesh"
)


def _csr_problem(rng, batch, V, max_hot, weighted=False):
    hots = rng.integers(0, max_hot + 1, batch)
    offsets = np.concatenate([[0], np.cumsum(hots)]).astype(np.int32)
    nnz = int(offsets[-1])
    idx = rng.integers(0, V, max(nnz, 1)).astype(np.int32)
    w = (
        rng.choice([0.5, 0.25, 1.0], max(nnz, 1)).astype(np.float32)
        if weighted else None
    )
    return idx[:nnz], offsets, None if w is None else w[:nnz]


@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN])
@pytest.mark.parametrize("weighted", [False, True])
def test_row_sharded_csr_data_axis(mode, weighted):
    if weighted and mode != CombineMode.SUM:
        pytest.skip("weights only with SUM")
    rng = np.random.default_rng(0)
    mesh = make_mesh()
    n_data = mesh.shape["data"]
    V, W, batch = 512, 32, 8 * n_data
    table = rng.standard_normal((V, W)).astype(np.float32)
    idx, offsets, w = _csr_problem(rng, batch, V, 6, weighted)

    ref = embedding_lookup_csr(
        jnp.asarray(table), jnp.asarray(idx), jnp.asarray(offsets),
        None if w is None else jnp.asarray(w), mode=mode,
    )

    blocks = shard_csr(idx, offsets, n_data, w)
    idx_b, off_b, w_b = blocks
    out = row_sharded_lookup(
        jnp.asarray(table), jnp.asarray(idx_b),
        None if w_b is None else jnp.asarray(w_b),
        jnp.asarray(off_b), mesh=mesh, mode=mode,
    )
    got = np.asarray(out).reshape(batch, W)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN])
@pytest.mark.parametrize("weighted", [False, True])
def test_alltoall_csr(mode, weighted):
    if weighted and mode != CombineMode.SUM:
        pytest.skip("weights only with SUM")
    rng = np.random.default_rng(1)
    mesh = make_mesh(n_model=jax.device_count())
    mesh = jax.sharding.Mesh(
        np.array(jax.devices()), ("model",)
    )
    n = jax.device_count()
    V, W, batch = 64 * n, 32, 4 * n
    table = rng.standard_normal((V, W)).astype(np.float32)
    idx, offsets, w = _csr_problem(rng, batch, V, 5, weighted)

    ref = embedding_lookup_csr(
        jnp.asarray(table), jnp.asarray(idx), jnp.asarray(offsets),
        None if w is None else jnp.asarray(w), mode=mode,
    )

    idx_b, off_b, w_b = shard_csr(idx, offsets, n, w)
    out = alltoall_row_sharded_lookup(
        jnp.asarray(table), jnp.asarray(idx_b),
        None if w_b is None else jnp.asarray(w_b),
        jnp.asarray(off_b), mesh=mesh, mode=mode,
        capacity_factor=8.0,
    )
    got = np.asarray(out).reshape(batch, W)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_alltoall_csr_overflow_fallback():
    """Skewed traffic overflows a destination bucket: the cond fallback
    reroutes at full capacity and stays exact."""
    rng = np.random.default_rng(2)
    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("model",))
    n = jax.device_count()
    V, W, batch = 16 * n, 32, 2 * n
    table = rng.standard_normal((V, W)).astype(np.float32)
    hots = np.full(batch, 4)
    offsets = np.concatenate([[0], np.cumsum(hots)]).astype(np.int32)
    idx = np.zeros(int(offsets[-1]), np.int32)  # ALL traffic to shard 0

    ref = embedding_lookup_csr(
        jnp.asarray(table), jnp.asarray(idx), jnp.asarray(offsets),
        mode=CombineMode.SUM,
    )
    idx_b, off_b, _ = shard_csr(idx, offsets, n)
    out = alltoall_row_sharded_lookup(
        jnp.asarray(table), jnp.asarray(idx_b), None,
        jnp.asarray(off_b), mesh=mesh, mode=CombineMode.SUM,
        capacity_factor=1.0,
    )
    got = np.asarray(out).reshape(batch, W)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN])
@pytest.mark.parametrize("weighted", [False, True])
def test_hybrid_csr(mode, weighted):
    """Hybrid replicated-head/routed-tail on sharded-CSR blocks."""
    if weighted and mode != CombineMode.SUM:
        pytest.skip("weights only with SUM")
    from cuembed_tpu.parallel.alltoall_lookup import (
        hybrid_tiered_lookup,
        split_hybrid_table,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(7)
    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("model",))
    n = jax.device_count()
    V, W, hot, batch = 64 * n, 32, 16 * n, 4 * n
    table = rng.standard_normal((V, W)).astype(np.float32)
    idx, offsets, w = _csr_problem(rng, batch, V, 5, weighted)
    # skew half the traffic into the head so both paths carry load
    idx[::2] = rng.integers(0, hot, idx[::2].shape)

    ref = embedding_lookup_csr(
        jnp.asarray(table), jnp.asarray(idx), jnp.asarray(offsets),
        None if w is None else jnp.asarray(w), mode=mode,
    )

    idx_b, off_b, w_b = shard_csr(idx, offsets, n, w)
    head, tail = split_hybrid_table(jnp.asarray(table), hot, n)
    hs = jax.device_put(head, NamedSharding(mesh, P()))
    ts = jax.device_put(tail, NamedSharding(mesh, P("model", None)))
    out = hybrid_tiered_lookup(
        hs, ts, jnp.asarray(idx_b),
        None if w_b is None else jnp.asarray(w_b),
        jnp.asarray(off_b), mesh=mesh, mode=mode,
        capacity_factor=8.0,
    )
    got = np.asarray(out).reshape(batch, W)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_hybrid_csr_overflow_fallback():
    """Cold CSR traffic concentrated on one tail shard overflows a tiny
    capacity; the cond fallback must stay exact."""
    from cuembed_tpu.parallel.alltoall_lookup import (
        hybrid_tiered_lookup,
        split_hybrid_table,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(8)
    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("model",))
    n = jax.device_count()
    V, W, hot, batch = 64 * n, 16, 16, 4 * n
    table = rng.standard_normal((V, W)).astype(np.float32)
    idx, offsets, _ = _csr_problem(rng, batch, V, 6)
    # every cold index owned by tail shard 0
    idx[:] = rng.integers(hot, hot + 8, idx.shape)

    ref = embedding_lookup_csr(
        jnp.asarray(table), jnp.asarray(idx), jnp.asarray(offsets),
        mode=CombineMode.SUM,
    )
    idx_b, off_b, _ = shard_csr(idx, offsets, n)
    head, tail = split_hybrid_table(jnp.asarray(table), hot, n)
    hs = jax.device_put(head, NamedSharding(mesh, P()))
    ts = jax.device_put(tail, NamedSharding(mesh, P("model", None)))
    out = hybrid_tiered_lookup(
        hs, ts, jnp.asarray(idx_b), None, jnp.asarray(off_b),
        mesh=mesh, capacity_factor=0.05, cold_frac=0.2,
    )
    got = np.asarray(out).reshape(batch, W)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-5, atol=2e-5)
