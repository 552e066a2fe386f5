"""Sharded-lookup tests on a virtual 8-device CPU mesh.

Validates that row/column table sharding + psum/all_gather pooling produce
exactly the single-device result, forward and backward — the distributed
extension the reference defers to future work (README.md:110).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cuembed_tpu import CombineMode, embedding_lookup, embedding_lookup_csr
from cuembed_tpu.parallel import (
    column_sharded_lookup,
    make_mesh,
    pad_table_for_shards,
    row_sharded_lookup,
    table_sharding,
    batch_sharding,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(n_model=4)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((1000, 32)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 1000, size=(64, 8)).astype(np.int32))
    w = jnp.asarray(np.where(rng.random((64, 8)) < 0.5, 0.5, 0.25).astype(np.float32))
    return table, idx, w


@pytest.mark.parametrize(
    "mode", [CombineMode.SUM, CombineMode.MEAN, CombineMode.CONCAT]
)
def test_row_sharded_matches_single_device(mesh, problem, mode):
    table, idx, w = problem
    table_p = pad_table_for_shards(table, mesh.shape["model"])
    table_s = jax.device_put(table_p, table_sharding(mesh))
    idx_s = jax.device_put(idx, batch_sharding(mesh))
    weights = w if mode == CombineMode.SUM else None

    got = row_sharded_lookup(table_s, idx_s, weights, mesh=mesh, mode=mode)
    want = embedding_lookup(table, idx, weights, mode=mode, backend="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
    )


def test_row_sharded_grad(mesh, problem):
    table, idx, _ = problem
    n_model = mesh.shape["model"]
    table_p = pad_table_for_shards(table, n_model)
    table_s = jax.device_put(table_p, table_sharding(mesh))
    idx_s = jax.device_put(idx, batch_sharding(mesh))

    def loss_sharded(t):
        return jnp.sum(row_sharded_lookup(t, idx_s, mesh=mesh) ** 2)

    def loss_single(t):
        return jnp.sum(embedding_lookup(t, idx, backend="xla") ** 2)

    g_sharded = jax.grad(loss_sharded)(table_s)
    g_single = jax.grad(loss_single)(table)
    np.testing.assert_allclose(
        np.asarray(g_sharded)[: table.shape[0]],
        np.asarray(g_single),
        rtol=1e-5,
        atol=1e-5,
    )
    # Padding rows got no gradient.
    np.testing.assert_array_equal(
        np.asarray(g_sharded)[table.shape[0]:], 0.0
    )


def test_row_sharded_csr(mesh):
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.standard_normal((512, 16)).astype(np.float32))
    per = rng.integers(0, 6, 64)
    offsets = np.concatenate([[0], np.cumsum(per)]).astype(np.int32)
    cap = int(offsets[-1]) + 8 - int(offsets[-1]) % 8  # pad to /8 for sharding
    idx = rng.integers(0, 512, cap).astype(np.int32)

    table_s = jax.device_put(table, table_sharding(mesh))
    got = row_sharded_lookup(
        table_s,
        jnp.asarray(idx),
        None,
        jnp.asarray(offsets),
        mesh=mesh,
        mode=CombineMode.MEAN,
    )
    want = embedding_lookup_csr(
        table, jnp.asarray(idx), jnp.asarray(offsets), mode=CombineMode.MEAN,
        backend="xla",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_column_sharded_matches_single_device(mesh, problem):
    table, idx, _ = problem
    table_s = jax.device_put(table, table_sharding(mesh, column=True))
    idx_s = jax.device_put(idx, batch_sharding(mesh))
    got = column_sharded_lookup(table_s, idx_s, mesh=mesh)
    want = embedding_lookup(table, idx, backend="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_make_mesh_shapes():
    m = make_mesh()
    assert m.shape["data"] * m.shape["model"] == len(jax.devices())


def test_row_sharded_tiered_local_engine(mesh):
    """The tiered engine runs INSIDE shard_map on each local slice: any
    contiguous slice of a frequency-ordered table is frequency-ordered,
    and foreign positions enter as inert (coeff-0) MXU-head traffic."""
    from cuembed_tpu.ops.tiered import TieredConfig

    rng = np.random.default_rng(40)
    V, W, B, H = 4096, 128, 64, 8
    n_model = mesh.shape["model"]
    table = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    # skewed (frequency-ordered) ids so tiers populate on shard 0
    r = rng.random((B, H))
    idx = jnp.asarray(np.minimum((r ** 4 * V).astype(np.int32), V - 1))
    cfg = TieredConfig(
        hot_rows=512, chunk_elems=64, cold_slots=64,
        mxu_head_rows=64, mid_slots=64,
    )  # local-slice units: hot_rows < V / n_model
    assert cfg.hot_rows <= V // n_model
    table_s = jax.device_put(table, table_sharding(mesh))
    idx_s = jax.device_put(idx, batch_sharding(mesh))
    got = row_sharded_lookup(table_s, idx_s, mesh=mesh, tiered_cfg=cfg)
    want = embedding_lookup(table, idx, backend="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )
