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


# ---------------------------------------------------------------------------
# Hybrid replicated-head + routed-cold-tail lookup
# ---------------------------------------------------------------------------

def _skewed_idx(rng, batch, hotness, V):
    """Power-law-ish draws so the head actually serves most traffic."""
    r = rng.random((batch, hotness))
    return np.minimum((r ** 4 * V).astype(np.int32), V - 1)


@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN])
@pytest.mark.parametrize("weighted", [False, True])
def test_hybrid_matches_single_device(mesh, mode, weighted):
    if weighted and mode != CombineMode.SUM:
        pytest.skip("weights only with SUM")
    from cuembed_tpu.parallel import hybrid_tiered_lookup, split_hybrid_table

    rng = np.random.default_rng(5)
    V, hot, B, H = 2048, 256, 64, 8
    table = jnp.asarray(rng.standard_normal((V, 32)).astype(np.float32))
    idx = jnp.asarray(_skewed_idx(rng, B, H, V))
    w = (
        jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
        if weighted
        else None
    )
    head, tail = split_hybrid_table(table, hot, 8)
    hs = jax.device_put(head, NamedSharding(mesh, P()))
    ts = jax.device_put(tail, NamedSharding(mesh, P("model", None)))
    xs = jax.device_put(idx, NamedSharding(mesh, P("model", None)))
    ws = (
        jax.device_put(w, NamedSharding(mesh, P("model", None)))
        if w is not None
        else None
    )
    got = hybrid_tiered_lookup(
        hs, ts, xs, ws, mesh=mesh, mode=mode, cold_frac=0.5
    )
    want = embedding_lookup(table, idx, w, mode=mode, backend="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_hybrid_overflow_falls_back_exactly(mesh):
    """All cold traffic lands on one shard => buckets overflow the tiny
    capacity; the full-capacity fallback must stay exact."""
    from cuembed_tpu.parallel import hybrid_tiered_lookup, split_hybrid_table

    rng = np.random.default_rng(6)
    V, hot, B, H = 2048, 256, 64, 8
    table = jnp.asarray(rng.standard_normal((V, 16)).astype(np.float32))
    # cold rows all owned by the first tail shard
    idx = jnp.asarray(rng.integers(hot, hot + 64, (B, H)).astype(np.int32))
    head, tail = split_hybrid_table(table, hot, 8)
    hs = jax.device_put(head, NamedSharding(mesh, P()))
    ts = jax.device_put(tail, NamedSharding(mesh, P("model", None)))
    xs = jax.device_put(idx, NamedSharding(mesh, P("model", None)))
    got = hybrid_tiered_lookup(
        hs, ts, xs, mesh=mesh, cold_frac=0.05, capacity_factor=1.0
    )
    want = embedding_lookup(table, idx, backend="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_hybrid_grads_flow_to_both_parts(mesh):
    from cuembed_tpu.parallel import hybrid_tiered_lookup, split_hybrid_table

    rng = np.random.default_rng(7)
    V, hot, B, H = 1024, 128, 32, 4
    table = jnp.asarray(rng.standard_normal((V, 16)).astype(np.float32))
    idx = jnp.asarray(_skewed_idx(rng, B, H, V))
    gy = jnp.asarray(rng.standard_normal((B, 16)).astype(np.float32))
    head, tail = split_hybrid_table(table, hot, 8)
    hs = jax.device_put(head, NamedSharding(mesh, P()))
    ts = jax.device_put(tail, NamedSharding(mesh, P("model", None)))
    xs = jax.device_put(idx, NamedSharding(mesh, P("model", None)))

    def loss_hybrid(h, t):
        return jnp.sum(
            hybrid_tiered_lookup(h, t, xs, mesh=mesh) * gy
        )

    def loss_plain(tab):
        return jnp.sum(embedding_lookup(tab, idx, backend="xla") * gy)

    gh, gt = jax.grad(loss_hybrid, argnums=(0, 1))(hs, ts)
    g = jax.grad(loss_plain)(table)
    np.testing.assert_allclose(
        np.asarray(gh), np.asarray(g[:hot]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gt)[: V - hot], np.asarray(g[hot:]), rtol=1e-5, atol=1e-5
    )


# ---------------------------------------------------------------------------
# Int8-compressed response payloads (lossy serving mode)
# ---------------------------------------------------------------------------

def test_alltoall_int8_compress_within_bound(mesh):
    """compress='int8' must match the exact route within the documented
    per-row bound (sum over routed hits of max|row|/254)."""
    rng = np.random.default_rng(8)
    V, B, H, W = 1024, 64, 8, 32
    table_np = rng.standard_normal((V, W)).astype(np.float32)
    idx_np = rng.integers(0, V, (B, H)).astype(np.int32)
    table = jnp.asarray(table_np)
    idx = jnp.asarray(idx_np)
    ts, xs, _ = _place(mesh, table, idx)
    exact = np.asarray(
        alltoall_row_sharded_lookup(ts, xs, mesh=mesh)
    )
    lossy = np.asarray(
        alltoall_row_sharded_lookup(ts, xs, mesh=mesh, compress="int8")
    )
    amax = np.abs(table_np).max(axis=1)
    bound = (amax[idx_np] / 254).sum(axis=1) + 1e-5
    assert (np.abs(lossy - exact).max(axis=1) <= bound).all()
    # and it is genuinely close (not garbage)
    np.testing.assert_allclose(lossy, exact, rtol=0.02, atol=0.05)


def test_hybrid_int8_compress_head_stays_exact(mesh):
    """Hybrid + compress='int8': head-served lookups remain EXACT; only
    routed cold rows carry the quantization error."""
    from cuembed_tpu.parallel import hybrid_tiered_lookup, split_hybrid_table

    rng = np.random.default_rng(9)
    V, hot, B, H, W = 2048, 256, 64, 8, 32
    table_np = rng.standard_normal((V, W)).astype(np.float32)
    idx_np = _skewed_idx(rng, B, H, V)
    table = jnp.asarray(table_np)
    idx = jnp.asarray(idx_np)
    head, tail = split_hybrid_table(table, hot, 8)
    hs = jax.device_put(head, NamedSharding(mesh, P()))
    ts = jax.device_put(tail, NamedSharding(mesh, P("model", None)))
    xs = jax.device_put(idx, NamedSharding(mesh, P("model", None)))
    exact = np.asarray(hybrid_tiered_lookup(hs, ts, xs, mesh=mesh))
    lossy = np.asarray(
        hybrid_tiered_lookup(hs, ts, xs, mesh=mesh, compress="int8")
    )
    amax = np.abs(table_np).max(axis=1)
    cold = idx_np >= hot
    bound = (amax[idx_np] / 254 * cold).sum(axis=1) + 1e-5
    assert (np.abs(lossy - exact).max(axis=1) <= bound).all()
    # samples with zero cold hits are bit-identical
    all_hot = ~cold.any(axis=1)
    if all_hot.any():
        np.testing.assert_array_equal(lossy[all_hot], exact[all_hot])


def test_int8_compress_refuses_grad(mesh):
    """Forward/serving only: jax.grad through compress='int8' must raise
    (a silent zero-gradient on routed rows would corrupt training)."""
    rng = np.random.default_rng(10)
    V, B, H, W = 1024, 64, 8, 32
    table = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, V, (B, H)).astype(np.int32))
    ts, xs, _ = _place(mesh, table, idx)

    def loss(t):
        return jnp.sum(
            alltoall_row_sharded_lookup(t, xs, mesh=mesh, compress="int8")
            ** 2
        )

    with pytest.raises(NotImplementedError, match="serving-only"):
        jax.grad(loss)(ts)


def test_alltoall_concat_matches_single_device(mesh):
    """CONCAT through the router: per-position rows, [batch*hotness, W]."""
    rng = np.random.default_rng(11)
    V, B, H, W = 1024, 64, 8, 32
    table = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, V, (B, H)).astype(np.int32))
    ts, xs, _ = _place(mesh, table, idx)
    got = alltoall_row_sharded_lookup(
        ts, xs, mesh=mesh, mode=CombineMode.CONCAT
    )
    want = embedding_lookup(
        table, idx, mode=CombineMode.CONCAT, backend="xla"
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
    )


def test_alltoall_concat_overflow_falls_back(mesh):
    rng = np.random.default_rng(12)
    V, B, H, W = 1024, 64, 4, 16
    table = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 128, (B, H)).astype(np.int32))
    ts, xs, _ = _place(mesh, table, idx)
    got = alltoall_row_sharded_lookup(
        ts, xs, mesh=mesh, mode=CombineMode.CONCAT, capacity_factor=0.25
    )
    want = embedding_lookup(
        table, idx, mode=CombineMode.CONCAT, backend="xla"
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
    )
