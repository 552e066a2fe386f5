"""All-to-all routed lookup tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cuembed_tpu import CombineMode, embedding_lookup
from cuembed_tpu.parallel import alltoall_row_sharded_lookup

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]), ("model",))


def _place(mesh, table, idx, w=None):
    ts = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    xs = jax.device_put(idx, NamedSharding(mesh, P("model", None)))
    ws = (
        jax.device_put(w, NamedSharding(mesh, P("model", None)))
        if w is not None
        else None
    )
    return ts, xs, ws


@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN])
@pytest.mark.parametrize("weighted", [False, True])
def test_alltoall_matches_single_device(mesh, mode, weighted):
    if weighted and mode != CombineMode.SUM:
        pytest.skip("weights only with SUM")
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((1024, 32)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 1024, (64, 8)).astype(np.int32))
    w = (
        jnp.asarray(rng.standard_normal((64, 8)).astype(np.float32))
        if weighted
        else None
    )
    ts, xs, ws = _place(mesh, table, idx, w)
    got = alltoall_row_sharded_lookup(ts, xs, ws, mesh=mesh, mode=mode)
    want = embedding_lookup(table, idx, w, mode=mode, backend="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_alltoall_overflow_falls_back_exactly(mesh):
    """All indices owned by shard 0 => every bucket overflows a tiny
    capacity; the psum fallback must keep the result exact."""
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.standard_normal((1024, 16)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 128, (64, 8)).astype(np.int32))  # shard 0 only
    ts, xs, _ = _place(mesh, table, idx)
    got = alltoall_row_sharded_lookup(
        ts, xs, mesh=mesh, capacity_factor=0.25
    )
    want = embedding_lookup(table, idx, backend="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_alltoall_grad_matches_single_device(mesh):
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.standard_normal((512, 16)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 512, (32, 4)).astype(np.int32))
    ts, xs, _ = _place(mesh, table, idx)

    def loss_sharded(t):
        return jnp.sum(alltoall_row_sharded_lookup(t, xs, mesh=mesh) ** 2)

    def loss_single(t):
        return jnp.sum(embedding_lookup(t, idx, backend="xla") ** 2)

    g_sharded = jax.grad(loss_sharded)(ts)
    g_single = jax.grad(loss_single)(table)
    np.testing.assert_allclose(
        np.asarray(g_sharded), np.asarray(g_single), rtol=1e-5, atol=1e-5
    )
