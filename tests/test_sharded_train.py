"""Routed sparse optimizer updates on the virtual 8-device CPU mesh.

The sharded updates must match the single-chip sparse updates (which are
themselves validated against the dense ``jax.grad`` path in
tests/test_train.py) up to fp reassociation: the routing delivers every
shard's (row, gradient-row) contributions to the owner before the
per-row sum, so semantics are identical.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cuembed_tpu import CombineMode
from cuembed_tpu.parallel import (
    sharded_rowwise_adagrad_sparse_update,
    sharded_sgd_sparse_update,
)
from cuembed_tpu.train import (
    rowwise_adagrad_init,
    rowwise_adagrad_sparse_update,
    sgd_sparse_update,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

N = 8


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:N]), ("model",))


def _problem(rng, V=1024, W=32, B=64, H=8, weighted=False):
    table = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, V, (B, H)).astype(np.int32))
    gy = jnp.asarray(rng.standard_normal((B, W)).astype(np.float32))
    w = (
        jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
        if weighted
        else None
    )
    return table, idx, gy, w


def _place(mesh, *arrs):
    out = []
    for a in arrs:
        if a is None:
            out.append(None)
        elif a.ndim == 2:
            out.append(jax.device_put(a, NamedSharding(mesh, P("model", None))))
        else:
            out.append(jax.device_put(a, NamedSharding(mesh, P("model"))))
    return out


@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN])
@pytest.mark.parametrize("weighted", [False, True])
def test_sharded_sgd_matches_single_chip(mesh, mode, weighted):
    if weighted and mode != CombineMode.SUM:
        pytest.skip("weights only with SUM")
    rng = np.random.default_rng(0)
    table, idx, gy, w = _problem(rng, weighted=weighted)
    want = sgd_sparse_update(
        table, idx, gy, lr=0.1, weights=w, mode=mode
    )
    ts, xs, gys, ws = _place(mesh, table, idx, gy, w)
    got = sharded_sgd_sparse_update(
        ts, xs, gys, mesh=mesh, lr=0.1, weights=ws, mode=mode
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_sharded_sgd_overflow_falls_back_exactly(mesh):
    """All indices owned by shard 0 — tiny capacity must trigger the
    collective-safe full-capacity fallback, not drop updates."""
    rng = np.random.default_rng(1)
    table, _, gy, _ = _problem(rng)
    idx = jnp.asarray(rng.integers(0, 128, (64, 8)).astype(np.int32))
    want = sgd_sparse_update(table, idx, gy, lr=0.1)
    ts, xs, gys = _place(mesh, table, idx, gy)
    got = sharded_sgd_sparse_update(
        ts, xs, gys, mesh=mesh, lr=0.1, capacity_factor=0.25
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN])
def test_sharded_adagrad_matches_single_chip(mesh, mode):
    rng = np.random.default_rng(2)
    table, idx, gy, _ = _problem(rng)
    accum0 = rowwise_adagrad_init(table.shape[0]) + 0.01
    want_t, want_a = rowwise_adagrad_sparse_update(
        table, accum0, idx, gy, lr=0.1, mode=mode
    )
    ts, xs, gys = _place(mesh, table, idx, gy)
    as_ = jax.device_put(accum0, NamedSharding(mesh, P("model")))
    got_t, got_a = sharded_rowwise_adagrad_sparse_update(
        ts, as_, xs, gys, mesh=mesh, lr=0.1, mode=mode
    )
    np.testing.assert_allclose(
        np.asarray(got_a), np.asarray(want_a), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got_t), np.asarray(want_t), rtol=1e-5, atol=1e-5
    )


def test_sharded_adagrad_weighted_and_repeat_steps(mesh):
    """Two chained steps with weighted SUM: accumulator state carries
    across steps identically to the single-chip path."""
    rng = np.random.default_rng(3)
    table, idx, gy, w = _problem(rng, weighted=True)
    accum = rowwise_adagrad_init(table.shape[0])
    want_t, want_a = table, accum
    for _ in range(2):
        want_t, want_a = rowwise_adagrad_sparse_update(
            want_t, want_a, idx, gy, lr=0.05, weights=w
        )
    ts, xs, gys, ws = _place(mesh, table, idx, gy, w)
    as_ = jax.device_put(accum, NamedSharding(mesh, P("model")))
    got_t, got_a = ts, as_
    for _ in range(2):
        got_t, got_a = sharded_rowwise_adagrad_sparse_update(
            got_t, got_a, xs, gys, mesh=mesh, lr=0.05, weights=ws
        )
    np.testing.assert_allclose(
        np.asarray(got_a), np.asarray(want_a), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got_t), np.asarray(want_t), rtol=1e-5, atol=1e-5
    )


def test_sharded_sgd_update_is_jittable_with_donation(mesh):
    """The production calling convention: donated table, one jit."""
    rng = np.random.default_rng(4)
    table, idx, gy, _ = _problem(rng)
    ts, xs, gys = _place(mesh, table, idx, gy)

    @jax.jit
    def step(t):
        return sharded_sgd_sparse_update(t, xs, gys, mesh=mesh, lr=0.1)

    out = jax.block_until_ready(step(ts))
    want = sgd_sparse_update(table, idx, gy, lr=0.1)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("weighted", [False, True])
def test_hybrid_sgd_matches_single_chip(mesh, weighted):
    """Hybrid update (psum'd MXU head grad + routed tail) must equal the
    single-chip sparse SGD on the concatenated table."""
    from cuembed_tpu.parallel import (
        sharded_hybrid_sgd_sparse_update,
        split_hybrid_table,
    )

    rng = np.random.default_rng(5)
    V, hot, B, H, W = 1024, 256, 64, 8, 32
    table, _, gy, w = _problem(rng, V=V, W=W, B=B, H=H, weighted=weighted)
    # skew toward the head so both branches carry real traffic
    idx = jnp.asarray(
        np.minimum((rng.random((B, H)) ** 2 * V).astype(np.int32), V - 1)
    )
    want = sgd_sparse_update(table, idx, gy, lr=0.1, weights=w)

    head, tail = split_hybrid_table(table, hot, N)
    hs = jax.device_put(head, NamedSharding(mesh, P()))
    ts = jax.device_put(tail, NamedSharding(mesh, P("model", None)))
    xs = jax.device_put(idx, NamedSharding(mesh, P("model", None)))
    gys = jax.device_put(gy, NamedSharding(mesh, P("model", None)))
    ws = (
        jax.device_put(w, NamedSharding(mesh, P("model", None)))
        if weighted else None
    )
    nh, nt = sharded_hybrid_sgd_sparse_update(
        hs, ts, xs, gys, mesh=mesh, lr=0.1, weights=ws, cold_frac=0.9
    )
    got = np.concatenate([np.asarray(nh), np.asarray(nt)])[:V]
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=1e-5)


def test_hybrid_sgd_overflow_falls_back_exactly(mesh):
    from cuembed_tpu.parallel import (
        sharded_hybrid_sgd_sparse_update,
        split_hybrid_table,
    )

    rng = np.random.default_rng(6)
    V, hot, B, H, W = 1024, 128, 64, 8, 16
    table, _, _, _ = _problem(rng, V=V, W=W, B=B, H=H)
    gy = jnp.asarray(rng.standard_normal((B, W)).astype(np.float32))
    # every cold index owned by tail shard 0 -> guaranteed overflow
    idx = jnp.asarray(
        (hot + rng.integers(0, 64, (B, H))).astype(np.int32)
    )
    want = sgd_sparse_update(table, idx, gy, lr=0.1)
    head, tail = split_hybrid_table(table, hot, N)
    hs = jax.device_put(head, NamedSharding(mesh, P()))
    ts = jax.device_put(tail, NamedSharding(mesh, P("model", None)))
    xs = jax.device_put(idx, NamedSharding(mesh, P("model", None)))
    gys = jax.device_put(gy, NamedSharding(mesh, P("model", None)))
    nh, nt = sharded_hybrid_sgd_sparse_update(
        hs, ts, xs, gys, mesh=mesh, lr=0.1, capacity_factor=0.25
    )
    got = np.concatenate([np.asarray(nh), np.asarray(nt)])[:V]
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN])
def test_sharded_sgd_csr_matches_single_chip(mesh, mode):
    """Sharded-CSR blocks through the routed update must equal the
    single-chip CSR sparse SGD on the global batch."""
    from cuembed_tpu.parallel import shard_csr

    rng = np.random.default_rng(7)
    V, W, B = 1024, 32, 64
    table = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    hots = rng.integers(0, 9, B)
    offs = np.concatenate([[0], np.cumsum(hots)]).astype(np.int32)
    vals = rng.integers(0, V, max(int(offs[-1]), 1)).astype(np.int32)
    gy = jnp.asarray(rng.standard_normal((B, W)).astype(np.float32))

    want = sgd_sparse_update(
        table, jnp.asarray(vals), gy, lr=0.1,
        offsets=jnp.asarray(offs), mode=mode,
    )

    ib, ob, _ = shard_csr(vals, offs, N)
    ts = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    ibs = jax.device_put(jnp.asarray(ib), NamedSharding(mesh, P("model", None)))
    obs = jax.device_put(jnp.asarray(ob), NamedSharding(mesh, P("model", None)))
    gys = jax.device_put(gy, NamedSharding(mesh, P("model", None)))
    got = sharded_sgd_sparse_update(
        ts, ibs, gys, mesh=mesh, lr=0.1, offsets=obs, mode=mode
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_sharded_adagrad_csr_matches_single_chip(mesh):
    from cuembed_tpu.parallel import shard_csr

    rng = np.random.default_rng(8)
    V, W, B = 1024, 16, 64
    table = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    hots = rng.integers(0, 6, B)
    offs = np.concatenate([[0], np.cumsum(hots)]).astype(np.int32)
    vals = rng.integers(0, V, max(int(offs[-1]), 1)).astype(np.int32)
    gy = jnp.asarray(rng.standard_normal((B, W)).astype(np.float32))
    accum0 = rowwise_adagrad_init(V)

    want_t, want_a = rowwise_adagrad_sparse_update(
        table, accum0, jnp.asarray(vals), gy, lr=0.1,
        offsets=jnp.asarray(offs),
    )

    ib, ob, _ = shard_csr(vals, offs, N)
    ts = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    as_ = jax.device_put(accum0, NamedSharding(mesh, P("model")))
    ibs = jax.device_put(jnp.asarray(ib), NamedSharding(mesh, P("model", None)))
    obs = jax.device_put(jnp.asarray(ob), NamedSharding(mesh, P("model", None)))
    gys = jax.device_put(gy, NamedSharding(mesh, P("model", None)))
    got_t, got_a = sharded_rowwise_adagrad_sparse_update(
        ts, as_, ibs, gys, mesh=mesh, lr=0.1, offsets=obs
    )
    np.testing.assert_allclose(
        np.asarray(got_a), np.asarray(want_a), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got_t), np.asarray(want_t), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("trial", range(8))
def test_fuzz_sharded_updates_match_single_chip(mesh, trial):
    """Randomized shapes/modes/capacities: the routed updates must agree
    with the single-chip sparse updates on every draw."""
    from cuembed_tpu.parallel import shard_csr

    rng = np.random.default_rng(2000 + trial)
    W = int(rng.choice([8, 16, 32]))
    V = int(rng.integers(2, 40)) * N * 8
    B = int(rng.integers(1, 9)) * N
    H = int(rng.integers(1, 9))
    mode = [CombineMode.SUM, CombineMode.MEAN][rng.integers(0, 2)]
    weighted = bool(rng.integers(0, 2)) and mode == CombineMode.SUM
    csr = bool(rng.integers(0, 2))
    capf = float(rng.choice([0.5, 1.0, 2.0]))
    adagrad = bool(rng.integers(0, 2))
    lr = 0.07

    table = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    gy = jnp.asarray(rng.standard_normal((B, W)).astype(np.float32))
    ts = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    gys = jax.device_put(gy, NamedSharding(mesh, P("model", None)))

    if csr:
        hots = rng.integers(0, H + 1, B)
        offs = np.concatenate([[0], np.cumsum(hots)]).astype(np.int32)
        vals = rng.integers(0, V, max(int(offs[-1]), 1)).astype(np.int32)
        w = (
            rng.standard_normal(vals.shape[0]).astype(np.float32)
            if weighted else None
        )
        ib, ob, wb = shard_csr(vals, offs, N, w)
        kw = dict(offsets=jnp.asarray(offs), weights=None if w is None
                  else jnp.asarray(w), mode=mode)
        skw = dict(
            offsets=jax.device_put(
                jnp.asarray(ob), NamedSharding(mesh, P("model", None))
            ),
            weights=None if wb is None else jax.device_put(
                jnp.asarray(wb), NamedSharding(mesh, P("model", None))
            ),
            mode=mode,
        )
        idx_single = jnp.asarray(vals)
        idx_sharded = jax.device_put(
            jnp.asarray(ib), NamedSharding(mesh, P("model", None))
        )
    else:
        idx = rng.integers(0, V, (B, H)).astype(np.int32)
        w = (
            rng.standard_normal((B, H)).astype(np.float32)
            if weighted else None
        )
        kw = dict(weights=None if w is None else jnp.asarray(w), mode=mode)
        skw = dict(
            weights=None if w is None else jax.device_put(
                jnp.asarray(w), NamedSharding(mesh, P("model", None))
            ),
            mode=mode,
        )
        idx_single = jnp.asarray(idx)
        idx_sharded = jax.device_put(
            idx_single, NamedSharding(mesh, P("model", None))
        )

    if adagrad:
        accum0 = rowwise_adagrad_init(V) + 0.005
        want_t, want_a = rowwise_adagrad_sparse_update(
            table, accum0, idx_single, gy, lr=lr, **kw
        )
        as_ = jax.device_put(accum0, NamedSharding(mesh, P("model")))
        got_t, got_a = sharded_rowwise_adagrad_sparse_update(
            ts, as_, idx_sharded, gys, mesh=mesh, lr=lr,
            capacity_factor=capf, **skw,
        )
        np.testing.assert_allclose(
            np.asarray(got_a), np.asarray(want_a), rtol=1e-4, atol=1e-6
        )
    else:
        want_t = sgd_sparse_update(table, idx_single, gy, lr=lr, **kw)
        got_t = sharded_sgd_sparse_update(
            ts, idx_sharded, gys, mesh=mesh, lr=lr,
            capacity_factor=capf, **skw,
        )
    np.testing.assert_allclose(
        np.asarray(got_t), np.asarray(want_t), rtol=1e-4, atol=1e-5
    )


@pytest.fixture(scope="module")
def mesh2d():
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devs, ("data", "model"))


@pytest.mark.parametrize("weighted", [False, True])
def test_column_sharded_sgd_matches_single_chip(mesh2d, weighted):
    from cuembed_tpu.parallel import column_sharded_sgd_sparse_update

    rng = np.random.default_rng(9)
    table, idx, gy, w = _problem(rng, V=512, W=64, weighted=weighted)
    want = sgd_sparse_update(table, idx, gy, lr=0.1, weights=w)
    ts = jax.device_put(table, NamedSharding(mesh2d, P(None, "model")))
    xs = jax.device_put(idx, NamedSharding(mesh2d, P("data", None)))
    gys = jax.device_put(gy, NamedSharding(mesh2d, P("data", "model")))
    ws = (
        jax.device_put(w, NamedSharding(mesh2d, P("data", None)))
        if weighted else None
    )
    got = column_sharded_sgd_sparse_update(
        ts, xs, gys, mesh=mesh2d, lr=0.1, weights=ws
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN])
def test_column_sharded_adagrad_matches_single_chip(mesh2d, mode):
    from cuembed_tpu.parallel import (
        column_sharded_rowwise_adagrad_sparse_update,
    )

    rng = np.random.default_rng(10)
    table, idx, gy, _ = _problem(rng, V=512, W=64)
    accum0 = rowwise_adagrad_init(512) + 0.02
    want_t, want_a = rowwise_adagrad_sparse_update(
        table, accum0, idx, gy, lr=0.1, mode=mode
    )
    ts = jax.device_put(table, NamedSharding(mesh2d, P(None, "model")))
    as_ = jax.device_put(accum0, NamedSharding(mesh2d, P(None)))
    xs = jax.device_put(idx, NamedSharding(mesh2d, P("data", None)))
    gys = jax.device_put(gy, NamedSharding(mesh2d, P("data", "model")))
    got_t, got_a = column_sharded_rowwise_adagrad_sparse_update(
        ts, as_, xs, gys, mesh=mesh2d, lr=0.1, mode=mode
    )
    np.testing.assert_allclose(
        np.asarray(got_a), np.asarray(want_a), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got_t), np.asarray(want_t), rtol=1e-5, atol=1e-5
    )


def test_sharded_update_is_deterministic(mesh):
    """Two identical routed updates must be BITWISE identical (sorted
    segment sums, no atomics — the determinism claim at multi-chip)."""
    rng = np.random.default_rng(11)
    table, idx, gy, _ = _problem(rng)
    ts, xs, gys = _place(mesh, table, idx, gy)
    a = sharded_sgd_sparse_update(ts, xs, gys, mesh=mesh, lr=0.1)
    b = sharded_sgd_sparse_update(ts, xs, gys, mesh=mesh, lr=0.1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_sgd_bf16_table(mesh):
    """bf16 storage: the routed update matches the single-chip update
    exactly (identical cast points), within bf16 round-off of fp32."""
    rng = np.random.default_rng(12)
    table, idx, gy, _ = _problem(rng)
    tb = table.astype(jnp.bfloat16)
    want = sgd_sparse_update(tb, idx, gy, lr=0.1)
    ts, xs, gys = _place(mesh, tb, idx, gy)
    got = sharded_sgd_sparse_update(ts, xs, gys, mesh=mesh, lr=0.1)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )


@pytest.mark.parametrize("weighted", [False, True])
def test_hybrid_adagrad_matches_single_chip(mesh, weighted):
    """Hybrid AdaGrad (dense head step on the psum'd gradient + routed
    compressed tail) equals the single-chip row-wise AdaGrad."""
    from cuembed_tpu.parallel import (
        sharded_hybrid_rowwise_adagrad_sparse_update,
        split_hybrid_table,
    )

    rng = np.random.default_rng(11)
    V, hot, B, H, W = 1024, 256, 64, 8, 32
    table, _, gy, w = _problem(rng, V=V, W=W, B=B, H=H, weighted=weighted)
    idx = jnp.asarray(
        np.minimum((rng.random((B, H)) ** 2 * V).astype(np.int32), V - 1)
    )
    want_t, want_a = rowwise_adagrad_sparse_update(
        table, jnp.zeros((V,), jnp.float32), idx, gy, lr=0.1, weights=w
    )

    head, tail = split_hybrid_table(table, hot, N)
    hs = jax.device_put(head, NamedSharding(mesh, P()))
    ts = jax.device_put(tail, NamedSharding(mesh, P("model", None)))
    ha = jax.device_put(
        jnp.zeros((hot,), jnp.float32), NamedSharding(mesh, P())
    )
    ta = jax.device_put(
        jnp.zeros((tail.shape[0],), jnp.float32),
        NamedSharding(mesh, P("model")),
    )
    xs = jax.device_put(idx, NamedSharding(mesh, P("model", None)))
    gys = jax.device_put(gy, NamedSharding(mesh, P("model", None)))
    ws = (
        jax.device_put(w, NamedSharding(mesh, P("model", None)))
        if weighted else None
    )
    nh, nt, nha, nta = sharded_hybrid_rowwise_adagrad_sparse_update(
        hs, ts, ha, ta, xs, gys, mesh=mesh, lr=0.1, weights=ws,
        cold_frac=0.9,
    )
    got_t = np.concatenate([np.asarray(nh), np.asarray(nt)])[:V]
    got_a = np.concatenate([np.asarray(nha), np.asarray(nta)])[:V]
    np.testing.assert_allclose(
        got_t, np.asarray(want_t), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        got_a, np.asarray(want_a), rtol=1e-4, atol=1e-5
    )


def test_hybrid_adagrad_overflow_and_second_step(mesh):
    """Overflowing cold capacity falls back exactly, and a second step
    keeps compounding the accumulator like the single-chip op."""
    from cuembed_tpu.parallel import (
        sharded_hybrid_rowwise_adagrad_sparse_update,
        split_hybrid_table,
    )

    rng = np.random.default_rng(12)
    V, hot, B, H, W = 1024, 128, 64, 8, 16
    table, _, _, _ = _problem(rng, V=V, W=W, B=B, H=H)
    gy = jnp.asarray(rng.standard_normal((B, W)).astype(np.float32))
    idx = jnp.asarray(
        (hot + rng.integers(0, 64, (B, H))).astype(np.int32)
    )
    want_t, want_a = table, jnp.zeros((V,), jnp.float32)
    for _ in range(2):
        want_t, want_a = rowwise_adagrad_sparse_update(
            want_t, want_a, idx, gy, lr=0.1
        )

    head, tail = split_hybrid_table(table, hot, N)
    hs = jax.device_put(head, NamedSharding(mesh, P()))
    ts = jax.device_put(tail, NamedSharding(mesh, P("model", None)))
    ha = jax.device_put(
        jnp.zeros((hot,), jnp.float32), NamedSharding(mesh, P())
    )
    ta = jax.device_put(
        jnp.zeros((tail.shape[0],), jnp.float32),
        NamedSharding(mesh, P("model")),
    )
    xs = jax.device_put(idx, NamedSharding(mesh, P("model", None)))
    gys = jax.device_put(gy, NamedSharding(mesh, P("model", None)))
    for _ in range(2):
        hs, ts, ha, ta = sharded_hybrid_rowwise_adagrad_sparse_update(
            hs, ts, ha, ta, xs, gys, mesh=mesh, lr=0.1,
            capacity_factor=0.25,
        )
    got_t = np.concatenate([np.asarray(hs), np.asarray(ts)])[:V]
    got_a = np.concatenate([np.asarray(ha), np.asarray(ta)])[:V]
    np.testing.assert_allclose(
        got_t, np.asarray(want_t), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        got_a, np.asarray(want_a), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN])
def test_hybrid_sgd_csr_matches_single_chip(mesh, mode):
    """Hybrid update on sharded-CSR blocks: position-major head gradient
    + routed cold tail must equal the single-chip CSR sparse SGD."""
    from cuembed_tpu.parallel import (
        shard_csr,
        sharded_hybrid_sgd_sparse_update,
        split_hybrid_table,
    )

    rng = np.random.default_rng(13)
    V, hot, W, B = 1024, 256, 32, 64
    table = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    hots = rng.integers(0, 9, B)
    offs = np.concatenate([[0], np.cumsum(hots)]).astype(np.int32)
    nnz = max(int(offs[-1]), 1)
    vals = rng.integers(0, V, nnz).astype(np.int32)
    vals[::2] = rng.integers(0, hot, vals[::2].shape)  # head traffic too
    gy = jnp.asarray(rng.standard_normal((B, W)).astype(np.float32))

    want = sgd_sparse_update(
        table, jnp.asarray(vals), gy, lr=0.1,
        offsets=jnp.asarray(offs), mode=mode,
    )

    ib, ob, _ = shard_csr(vals, offs, N)
    head, tail = split_hybrid_table(table, hot, N)
    hs = jax.device_put(head, NamedSharding(mesh, P()))
    ts = jax.device_put(tail, NamedSharding(mesh, P("model", None)))
    ibs = jax.device_put(
        jnp.asarray(ib), NamedSharding(mesh, P("model", None))
    )
    obs = jax.device_put(
        jnp.asarray(ob), NamedSharding(mesh, P("model", None))
    )
    gys = jax.device_put(gy, NamedSharding(mesh, P("model", None)))
    nh, nt = sharded_hybrid_sgd_sparse_update(
        hs, ts, ibs, gys, mesh=mesh, lr=0.1, offsets=obs, mode=mode,
        cold_frac=0.9,
    )
    got = np.concatenate([np.asarray(nh), np.asarray(nt)])[:V]
    np.testing.assert_allclose(
        got, np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_hybrid_adagrad_csr_matches_single_chip(mesh):
    from cuembed_tpu.parallel import (
        shard_csr,
        sharded_hybrid_rowwise_adagrad_sparse_update,
        split_hybrid_table,
    )

    rng = np.random.default_rng(14)
    V, hot, W, B = 1024, 256, 16, 64
    table = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    hots = rng.integers(0, 6, B)
    offs = np.concatenate([[0], np.cumsum(hots)]).astype(np.int32)
    nnz = max(int(offs[-1]), 1)
    vals = rng.integers(0, V, nnz).astype(np.int32)
    vals[::2] = rng.integers(0, hot, vals[::2].shape)
    gy = jnp.asarray(rng.standard_normal((B, W)).astype(np.float32))

    want_t, want_a = rowwise_adagrad_sparse_update(
        table, rowwise_adagrad_init(V), jnp.asarray(vals), gy, lr=0.1,
        offsets=jnp.asarray(offs),
    )

    ib, ob, _ = shard_csr(vals, offs, N)
    head, tail = split_hybrid_table(table, hot, N)
    hs = jax.device_put(head, NamedSharding(mesh, P()))
    ts = jax.device_put(tail, NamedSharding(mesh, P("model", None)))
    ha = jax.device_put(
        jnp.zeros((hot,), jnp.float32), NamedSharding(mesh, P())
    )
    ta = jax.device_put(
        jnp.zeros((tail.shape[0],), jnp.float32),
        NamedSharding(mesh, P("model")),
    )
    ibs = jax.device_put(
        jnp.asarray(ib), NamedSharding(mesh, P("model", None))
    )
    obs = jax.device_put(
        jnp.asarray(ob), NamedSharding(mesh, P("model", None))
    )
    gys = jax.device_put(gy, NamedSharding(mesh, P("model", None)))
    nh, nt, nha, nta = sharded_hybrid_rowwise_adagrad_sparse_update(
        hs, ts, ha, ta, ibs, gys, mesh=mesh, lr=0.1, offsets=obs,
        cold_frac=0.9,
    )
    got_t = np.concatenate([np.asarray(nh), np.asarray(nt)])[:V]
    got_a = np.concatenate([np.asarray(nha), np.asarray(nta)])[:V]
    np.testing.assert_allclose(
        got_t, np.asarray(want_t), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        got_a, np.asarray(want_a), rtol=1e-4, atol=1e-5
    )


@pytest.fixture(scope="module")
def grid_mesh():
    return Mesh(
        np.array(jax.devices()[:8]).reshape(2, 4), ("data", "model")
    )


@pytest.mark.parametrize("weighted", [False, True])
def test_grid_lookup_matches_single_chip(grid_mesh, weighted):
    """Grid-sharded (row x column) lookup == the plain lookup."""
    from cuembed_tpu import embedding_lookup
    from cuembed_tpu.parallel import grid_sharded_lookup

    rng = np.random.default_rng(20)
    V, W, B, H = 512, 64, 32, 4  # rows over model(4), cols over data(2)
    table = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, V, (B, H)).astype(np.int32))
    w = (
        jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
        if weighted else None
    )
    ts = jax.device_put(
        table, NamedSharding(grid_mesh, P("model", "data"))
    )
    xs = jax.device_put(idx, NamedSharding(grid_mesh, P("model", None)))
    ws = (
        jax.device_put(w, NamedSharding(grid_mesh, P("model", None)))
        if w is not None else None
    )
    got = grid_sharded_lookup(
        ts, xs, ws, mesh=grid_mesh, row_axis="model", col_axis="data"
    )
    want = embedding_lookup(table, idx, w, backend="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_grid_sgd_and_adagrad_match_single_chip(grid_mesh):
    from cuembed_tpu.parallel import (
        grid_sharded_rowwise_adagrad_sparse_update,
        grid_sharded_sgd_sparse_update,
    )

    rng = np.random.default_rng(21)
    V, W, B, H = 512, 64, 32, 4
    table = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, V, (B, H)).astype(np.int32))
    gy = jnp.asarray(rng.standard_normal((B, W)).astype(np.float32))

    ts = jax.device_put(
        table, NamedSharding(grid_mesh, P("model", "data"))
    )
    xs = jax.device_put(idx, NamedSharding(grid_mesh, P("model", None)))
    gys = jax.device_put(gy, NamedSharding(grid_mesh, P("model", "data")))

    want = sgd_sparse_update(table, idx, gy, lr=0.1)
    got = grid_sharded_sgd_sparse_update(
        ts, xs, gys, mesh=grid_mesh, lr=0.1,
        row_axis="model", col_axis="data",
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )

    want_t, want_a = rowwise_adagrad_sparse_update(
        table, rowwise_adagrad_init(V), idx, gy, lr=0.1
    )
    as_ = jax.device_put(
        jnp.zeros((V,), jnp.float32), NamedSharding(grid_mesh, P("model"))
    )
    got_t, got_a = grid_sharded_rowwise_adagrad_sparse_update(
        ts, as_, xs, gys, mesh=grid_mesh, lr=0.1,
        row_axis="model", col_axis="data",
    )
    np.testing.assert_allclose(
        np.asarray(got_t), np.asarray(want_t), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_a), np.asarray(want_a), rtol=1e-4, atol=1e-6
    )


def test_grid_lookup_overflow_falls_back_exactly(grid_mesh):
    from cuembed_tpu import embedding_lookup
    from cuembed_tpu.parallel import grid_sharded_lookup

    rng = np.random.default_rng(22)
    V, W, B, H = 512, 32, 32, 4
    table = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    # all ids owned by row shard 0 -> guaranteed bucket overflow
    idx = jnp.asarray(rng.integers(0, V // 4, (B, H)).astype(np.int32))
    ts = jax.device_put(
        table, NamedSharding(grid_mesh, P("model", "data"))
    )
    xs = jax.device_put(idx, NamedSharding(grid_mesh, P("model", None)))
    got = grid_sharded_lookup(
        ts, xs, mesh=grid_mesh, capacity_factor=0.25,
        row_axis="model", col_axis="data",
    )
    want = embedding_lookup(table, idx, backend="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_grid_updates_validate_table_divisibility(grid_mesh):
    """Non-divisible tables raise the library's actionable error up
    front instead of an opaque shard_map trace (parity with
    grid_sharded_lookup)."""
    from cuembed_tpu.parallel import (
        grid_sharded_rowwise_adagrad_sparse_update,
        grid_sharded_sgd_sparse_update,
    )

    table = jnp.zeros((510, 64), jnp.float32)  # 510 % 4 != 0
    idx = jnp.zeros((32, 4), jnp.int32)
    gy = jnp.zeros((32, 64), jnp.float32)
    with pytest.raises(ValueError, match="pad table"):
        grid_sharded_sgd_sparse_update(
            table, idx, gy, mesh=grid_mesh, lr=0.1,
            row_axis="model", col_axis="data",
        )
    with pytest.raises(ValueError, match="pad table"):
        grid_sharded_rowwise_adagrad_sparse_update(
            table, jnp.zeros((510,), jnp.float32), idx, gy,
            mesh=grid_mesh, lr=0.1, row_axis="model", col_axis="data",
        )


def test_grid_lookup_int8_compress_within_bound(grid_mesh):
    """Grid routing with compress='int8' stays within the documented
    per-row quantization bound (each width slice quantizes against its
    own amax <= the full row's amax)."""
    from cuembed_tpu.parallel import grid_sharded_lookup

    rng = np.random.default_rng(23)
    V, W, B, H = 512, 256, 32, 4
    table_np = rng.standard_normal((V, W)).astype(np.float32)
    idx_np = rng.integers(0, V, (B, H)).astype(np.int32)
    ts = jax.device_put(
        jnp.asarray(table_np),
        NamedSharding(grid_mesh, P("model", "data")),
    )
    xs = jax.device_put(
        jnp.asarray(idx_np), NamedSharding(grid_mesh, P("model", None))
    )
    exact = np.asarray(
        grid_sharded_lookup(
            ts, xs, mesh=grid_mesh, row_axis="model", col_axis="data"
        )
    )
    lossy = np.asarray(
        grid_sharded_lookup(
            ts, xs, mesh=grid_mesh, row_axis="model", col_axis="data",
            compress="int8",
        )
    )
    amax = np.abs(table_np).max(axis=1)
    bound = (amax[idx_np] / 254).sum(axis=1) + 1e-5
    assert (np.abs(lossy - exact).max(axis=1) <= bound).all()
    np.testing.assert_allclose(lossy, exact, rtol=0.02, atol=0.05)


# ---------------------------------------------------------------------------
# CSR parity for the grid / column placements (reference treats CSR as
# co-equal with fixed everywhere: embedding_lookup.cuh:261-267)
# ---------------------------------------------------------------------------


def _csr_problem(rng, V, W, B, hmax):
    hots = rng.integers(0, hmax + 1, B)
    offs = np.concatenate([[0], np.cumsum(hots)]).astype(np.int32)
    vals = rng.integers(0, V, max(int(offs[-1]), 1)).astype(np.int32)
    table = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    gy = jnp.asarray(rng.standard_normal((B, W)).astype(np.float32))
    return table, vals, offs, gy


@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN])
def test_grid_lookup_csr_matches_single_chip(grid_mesh, mode):
    """Sharded-CSR blocks through the grid (row x column) routing must
    equal the single-chip CSR lookup on the global batch."""
    from cuembed_tpu import embedding_lookup_csr
    from cuembed_tpu.parallel import grid_sharded_lookup, shard_csr

    rng = np.random.default_rng(30)
    V, W, B = 512, 64, 32
    table, vals, offs, _ = _csr_problem(rng, V, W, B, 6)
    want = embedding_lookup_csr(
        table, jnp.asarray(vals), jnp.asarray(offs), mode=mode,
        backend="xla",
    )

    n_r = grid_mesh.shape["model"]
    ib, ob, _ = shard_csr(vals, offs, n_r)
    ts = jax.device_put(table, NamedSharding(grid_mesh, P("model", "data")))
    ibs = jax.device_put(
        jnp.asarray(ib), NamedSharding(grid_mesh, P("model", None))
    )
    obs = jax.device_put(
        jnp.asarray(ob), NamedSharding(grid_mesh, P("model", None))
    )
    got = grid_sharded_lookup(
        ts, ibs, None, obs, mesh=grid_mesh, mode=mode,
        row_axis="model", col_axis="data",
    )
    np.testing.assert_allclose(
        np.asarray(got).reshape(B, W), np.asarray(want),
        rtol=1e-5, atol=1e-5,
    )


def test_grid_lookup_csr_feature_sharded_output(grid_mesh):
    """gather_output=False keeps the CSR block output feature-sharded."""
    from cuembed_tpu import embedding_lookup_csr
    from cuembed_tpu.parallel import grid_sharded_lookup, shard_csr

    rng = np.random.default_rng(31)
    V, W, B = 512, 64, 32
    table, vals, offs, _ = _csr_problem(rng, V, W, B, 5)
    n_r = grid_mesh.shape["model"]
    ib, ob, _ = shard_csr(vals, offs, n_r)
    ts = jax.device_put(table, NamedSharding(grid_mesh, P("model", "data")))
    ibs = jax.device_put(
        jnp.asarray(ib), NamedSharding(grid_mesh, P("model", None))
    )
    obs = jax.device_put(
        jnp.asarray(ob), NamedSharding(grid_mesh, P("model", None))
    )
    got = grid_sharded_lookup(
        ts, ibs, None, obs, mesh=grid_mesh, gather_output=False,
        row_axis="model", col_axis="data",
    )
    want = embedding_lookup_csr(
        table, jnp.asarray(vals), jnp.asarray(offs), backend="xla"
    )
    np.testing.assert_allclose(
        np.asarray(got).reshape(B, W), np.asarray(want),
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN])
def test_grid_sgd_csr_matches_single_chip(grid_mesh, mode):
    from cuembed_tpu.parallel import (
        grid_sharded_sgd_sparse_update,
        shard_csr,
    )

    rng = np.random.default_rng(32)
    V, W, B = 512, 64, 32
    table, vals, offs, gy = _csr_problem(rng, V, W, B, 6)
    want = sgd_sparse_update(
        table, jnp.asarray(vals), gy, lr=0.1, offsets=jnp.asarray(offs),
        mode=mode,
    )

    n_r = grid_mesh.shape["model"]
    ib, ob, _ = shard_csr(vals, offs, n_r)
    ts = jax.device_put(table, NamedSharding(grid_mesh, P("model", "data")))
    ibs = jax.device_put(
        jnp.asarray(ib), NamedSharding(grid_mesh, P("model", None))
    )
    obs = jax.device_put(
        jnp.asarray(ob), NamedSharding(grid_mesh, P("model", None))
    )
    gys = jax.device_put(gy, NamedSharding(grid_mesh, P("model", "data")))
    got = grid_sharded_sgd_sparse_update(
        ts, ibs, gys, mesh=grid_mesh, lr=0.1, offsets=obs, mode=mode,
        row_axis="model", col_axis="data",
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_grid_adagrad_csr_matches_single_chip(grid_mesh):
    from cuembed_tpu.parallel import (
        grid_sharded_rowwise_adagrad_sparse_update,
        shard_csr,
    )

    rng = np.random.default_rng(33)
    V, W, B = 512, 64, 32
    table, vals, offs, gy = _csr_problem(rng, V, W, B, 5)
    accum0 = rowwise_adagrad_init(V) + 0.01
    want_t, want_a = rowwise_adagrad_sparse_update(
        table, accum0, jnp.asarray(vals), gy, lr=0.1,
        offsets=jnp.asarray(offs),
    )

    n_r = grid_mesh.shape["model"]
    ib, ob, _ = shard_csr(vals, offs, n_r)
    ts = jax.device_put(table, NamedSharding(grid_mesh, P("model", "data")))
    as_ = jax.device_put(accum0, NamedSharding(grid_mesh, P("model")))
    ibs = jax.device_put(
        jnp.asarray(ib), NamedSharding(grid_mesh, P("model", None))
    )
    obs = jax.device_put(
        jnp.asarray(ob), NamedSharding(grid_mesh, P("model", None))
    )
    gys = jax.device_put(gy, NamedSharding(grid_mesh, P("model", "data")))
    got_t, got_a = grid_sharded_rowwise_adagrad_sparse_update(
        ts, as_, ibs, gys, mesh=grid_mesh, lr=0.1, offsets=obs,
        row_axis="model", col_axis="data",
    )
    np.testing.assert_allclose(
        np.asarray(got_a), np.asarray(want_a), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got_t), np.asarray(want_t), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("weighted", [False, True])
def test_column_sharded_sgd_csr_matches_single_chip(mesh2d, weighted):
    """Replicated flat CSR (the column LOOKUP's convention) through the
    column-sharded update must equal the single-chip CSR SGD."""
    from cuembed_tpu.parallel import column_sharded_sgd_sparse_update

    rng = np.random.default_rng(34)
    V, W, B = 512, 64, 32
    table, vals, offs, gy = _csr_problem(rng, V, W, B, 6)
    w = (
        rng.standard_normal(vals.shape[0]).astype(np.float32)
        if weighted else None
    )
    want = sgd_sparse_update(
        table, jnp.asarray(vals), gy, lr=0.1, offsets=jnp.asarray(offs),
        weights=None if w is None else jnp.asarray(w),
    )
    ts = jax.device_put(table, NamedSharding(mesh2d, P(None, "model")))
    xs = jax.device_put(jnp.asarray(vals), NamedSharding(mesh2d, P(None)))
    obs = jax.device_put(jnp.asarray(offs), NamedSharding(mesh2d, P(None)))
    gys = jax.device_put(gy, NamedSharding(mesh2d, P(None, "model")))
    ws = (
        jax.device_put(jnp.asarray(w), NamedSharding(mesh2d, P(None)))
        if w is not None else None
    )
    got = column_sharded_sgd_sparse_update(
        ts, xs, gys, mesh=mesh2d, lr=0.1, offsets=obs, weights=ws
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN])
def test_column_sharded_adagrad_csr_matches_single_chip(mesh2d, mode):
    from cuembed_tpu.parallel import (
        column_sharded_rowwise_adagrad_sparse_update,
    )

    rng = np.random.default_rng(35)
    V, W, B = 512, 64, 32
    table, vals, offs, gy = _csr_problem(rng, V, W, B, 5)
    accum0 = rowwise_adagrad_init(V) + 0.02
    want_t, want_a = rowwise_adagrad_sparse_update(
        table, accum0, jnp.asarray(vals), gy, lr=0.1,
        offsets=jnp.asarray(offs), mode=mode,
    )
    ts = jax.device_put(table, NamedSharding(mesh2d, P(None, "model")))
    as_ = jax.device_put(accum0, NamedSharding(mesh2d, P(None)))
    xs = jax.device_put(jnp.asarray(vals), NamedSharding(mesh2d, P(None)))
    obs = jax.device_put(jnp.asarray(offs), NamedSharding(mesh2d, P(None)))
    gys = jax.device_put(gy, NamedSharding(mesh2d, P(None, "model")))
    got_t, got_a = column_sharded_rowwise_adagrad_sparse_update(
        ts, as_, xs, gys, mesh=mesh2d, lr=0.1, offsets=obs, mode=mode
    )
    np.testing.assert_allclose(
        np.asarray(got_a), np.asarray(want_a), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got_t), np.asarray(want_t), rtol=1e-5, atol=1e-5
    )


def test_hybrid_head_grad_large_head_scatter_path():
    """VMEM-scale heads (> HEAD_GRAD_MXU_MAX_ROWS) take the scatter-add
    head gradient; it must equal the one-hot-matmul result (the round-5
    planner-validation harness measured the matmul at ~100+ ms on a
    442K-row head — the scatter path exists so hybrid updates scale
    with the head)."""
    import numpy as np

    import cuembed_tpu.parallel.train as ptr
    from cuembed_tpu.ops.head import head_grad

    rng = np.random.default_rng(97)
    hot_big = ptr.HEAD_GRAD_MXU_MAX_ROWS + 8
    B, H, W = 64, 8, 16
    idx = rng.integers(0, hot_big + 500, (B, H)).astype(np.int32)
    gy = rng.standard_normal((B, W)).astype(np.float32)
    flat = jnp.asarray(idx.reshape(-1))
    sids = jnp.asarray(
        (np.arange(B * H, dtype=np.int32) // H)
    )

    got = ptr._hybrid_head_grad(
        head_grad, jnp.asarray(idx), None, flat, sids, None,
        jnp.asarray(gy), hot_big,
    )
    # brute-force reference
    ref = np.zeros((hot_big, W), np.float32)
    for b in range(B):
        for h in range(H):
            if idx[b, h] < hot_big:
                ref[idx[b, h]] += gy[b]
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5,
                               atol=1e-5)

    # small heads keep the MXU matmul and agree with the same reference
    hot_small = 256
    got_small = ptr._hybrid_head_grad(
        head_grad, jnp.asarray(idx), None, flat, sids, None,
        jnp.asarray(gy), hot_small,
    )
    np.testing.assert_allclose(
        np.asarray(got_small), ref[:hot_small], rtol=1e-5, atol=1e-5
    )


def test_hybrid_sgd_large_head_matches_unsharded(mesh):
    """End-to-end: the hybrid sparse SGD step with a large head equals
    the unsharded sparse SGD on the unsplit table."""
    import numpy as np

    import cuembed_tpu.parallel.train as ptr
    from cuembed_tpu.parallel import (
        sharded_hybrid_sgd_sparse_update,
        split_hybrid_table,
    )
    from cuembed_tpu.train import sgd_sparse_update

    n = mesh.shape["model"]
    rng = np.random.default_rng(101)
    old = ptr.HEAD_GRAD_MXU_MAX_ROWS
    ptr.HEAD_GRAD_MXU_MAX_ROWS = 64  # force the scatter path cheaply
    try:
        rows, W, hot = 64 * n * 4, 16, 128
        full = jnp.asarray(rng.standard_normal((rows, W)), jnp.float32)
        head, tail = split_hybrid_table(full, hot, n)
        idx = jnp.asarray(
            rng.integers(0, rows, (8 * n, 4)).astype(np.int32)
        )
        gy = jnp.asarray(
            rng.standard_normal((8 * n, W)), jnp.float32
        )
        h2, t2 = sharded_hybrid_sgd_sparse_update(
            head, tail, idx, gy, mesh=mesh, lr=0.1,
        )
        ref = sgd_sparse_update(full, idx, gy, lr=0.1)
        np.testing.assert_allclose(
            np.asarray(h2), np.asarray(ref)[:hot], rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(t2)[: rows - hot], np.asarray(ref)[hot:],
            rtol=1e-4, atol=1e-4,
        )
    finally:
        ptr.HEAD_GRAD_MXU_MAX_ROWS = old
