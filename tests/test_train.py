"""Sparse-update training tests: parity vs dense autodiff gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cuembed_tpu import CombineMode, embedding_lookup, embedding_lookup_csr
from cuembed_tpu.ops.tiered import TieredConfig
from cuembed_tpu.train import (
    rowwise_adagrad_init,
    rowwise_adagrad_sparse_update,
    sgd_sparse_update,
)


def _dense_grad(table, idx, grad_y, *, offsets=None, weights=None,
                mode=CombineMode.SUM):
    def loss(t):
        if offsets is None:
            out = embedding_lookup(t, idx, weights, mode=mode, backend="xla")
        else:
            out = embedding_lookup_csr(
                t, idx, offsets, weights, mode=mode, backend="xla"
            )
        return jnp.sum(out * grad_y)

    return jax.grad(loss)(table)


@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN])
@pytest.mark.parametrize("tiered", [None, "cfg"])
def test_sgd_sparse_matches_dense(mode, tiered):
    rng = np.random.default_rng(0)
    V, W, B, H = 300, 16, 24, 6
    table = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, V, (B, H)).astype(np.int32))
    grad_y = jnp.asarray(rng.standard_normal((B, W)).astype(np.float32))
    cfg = (
        TieredConfig(hot_rows=100, chunk_elems=48, cold_slots=48,
                     mxu_head_rows=32, mid_slots=48)
        if tiered
        else None
    )
    lr = 0.1
    got = sgd_sparse_update(
        table, idx, grad_y, lr=lr, mode=mode, tiered_cfg=cfg
    )
    want = table - lr * _dense_grad(table, idx, grad_y, mode=mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_sgd_sparse_csr_weighted():
    rng = np.random.default_rng(1)
    V, W, B = 200, 8, 16
    table = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    hots = rng.integers(0, 5, B)
    offsets = jnp.asarray(
        np.concatenate([[0], np.cumsum(hots)]).astype(np.int32)
    )
    cap = int(offsets[-1]) + 5
    flat = jnp.asarray(rng.integers(0, V, cap).astype(np.int32))
    w = jnp.asarray(rng.standard_normal(cap).astype(np.float32))
    grad_y = jnp.asarray(rng.standard_normal((B, W)).astype(np.float32))
    lr = 0.05
    got = sgd_sparse_update(
        table, flat, grad_y, lr=lr, offsets=offsets, weights=w
    )
    want = table - lr * _dense_grad(
        table, flat, grad_y, offsets=offsets, weights=w
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_rowwise_adagrad_matches_reference_math():
    rng = np.random.default_rng(2)
    V, W, B, H = 120, 8, 16, 4
    table_np = rng.standard_normal((V, W)).astype(np.float32)
    idx_np = rng.integers(0, V, (B, H)).astype(np.int32)
    grad_y_np = rng.standard_normal((B, W)).astype(np.float32)
    lr, eps = 0.1, 1e-8

    table, accum = (
        jnp.asarray(table_np),
        rowwise_adagrad_init(V),
    )
    table2, accum2 = rowwise_adagrad_sparse_update(
        table, accum, jnp.asarray(idx_np), jnp.asarray(grad_y_np), lr=lr, eps=eps
    )

    # numpy reference
    dense = np.zeros((V, W), np.float32)
    for b in range(B):
        for h in range(H):
            dense[idx_np[b, h]] += grad_y_np[b]
    touched = np.unique(idx_np)
    accum_ref = np.zeros((V,), np.float32)
    table_ref = table_np.copy()
    for r in touched:
        accum_ref[r] += np.mean(dense[r] ** 2)
        table_ref[r] -= lr * dense[r] / np.sqrt(accum_ref[r] + eps)

    np.testing.assert_allclose(np.asarray(accum2), accum_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(table2), table_ref, rtol=1e-5, atol=1e-5)
    # untouched rows identical
    untouched = np.setdiff1d(np.arange(V), touched)
    np.testing.assert_array_equal(
        np.asarray(table2)[untouched], table_np[untouched]
    )


def test_adagrad_tiered_matches_plain():
    rng = np.random.default_rng(11)
    V, W, B, H = 300, 8, 32, 6
    table = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    accum = rowwise_adagrad_init(V) + 0.5  # nonzero state
    idx = jnp.asarray(rng.integers(0, V, (B, H)).astype(np.int32))
    gy = jnp.asarray(rng.standard_normal((B, W)).astype(np.float32))
    cfg = TieredConfig(hot_rows=120, chunk_elems=48, cold_slots=48,
                       mxu_head_rows=48, mid_slots=48)
    t_plain, a_plain = rowwise_adagrad_sparse_update(
        table, accum, idx, gy, lr=0.1)
    t_tier, a_tier = rowwise_adagrad_sparse_update(
        table, accum, idx, gy, lr=0.1, tiered_cfg=cfg)
    np.testing.assert_allclose(np.asarray(t_tier), np.asarray(t_plain),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(a_tier), np.asarray(a_plain),
                               rtol=2e-5, atol=2e-5)


def test_adagrad_tiered_capacity_overflow_exact():
    rng = np.random.default_rng(12)
    V, W, B, H = 200, 8, 16, 8
    table = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    accum = rowwise_adagrad_init(V)
    idx = jnp.asarray(rng.integers(64, V, (B, H)).astype(np.int32))  # no head
    gy = jnp.asarray(rng.standard_normal((B, W)).astype(np.float32))
    cfg = TieredConfig(hot_rows=150, chunk_elems=32, cold_slots=4,
                       mxu_head_rows=64, mid_slots=4)
    t_plain, a_plain = rowwise_adagrad_sparse_update(table, accum, idx, gy, lr=0.1)
    t_tier, a_tier = rowwise_adagrad_sparse_update(
        table, accum, idx, gy, lr=0.1, tiered_cfg=cfg)
    np.testing.assert_allclose(np.asarray(t_tier), np.asarray(t_plain),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(a_tier), np.asarray(a_plain),
                               rtol=2e-5, atol=2e-5)


def test_adagrad_second_step_accumulates():
    rng = np.random.default_rng(3)
    V, W, B, H = 60, 4, 8, 2
    table = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    accum = rowwise_adagrad_init(V)
    idx = jnp.asarray(rng.integers(0, V, (B, H)).astype(np.int32))
    gy = jnp.asarray(rng.standard_normal((B, W)).astype(np.float32))
    t1, a1 = rowwise_adagrad_sparse_update(table, accum, idx, gy, lr=0.1)
    t2, a2 = rowwise_adagrad_sparse_update(t1, a1, idx, gy, lr=0.1)
    assert float(jnp.sum(a2)) > float(jnp.sum(a1)) > 0
    assert not np.allclose(np.asarray(t1), np.asarray(t2))


def test_sgd_sparse_concat_matches_dense():
    rng = np.random.default_rng(30)
    V, W, B, H = 200, 8, 12, 4
    table = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, V, (B, H)).astype(np.int32))
    grad_y = jnp.asarray(rng.standard_normal((B * H, W)).astype(np.float32))
    lr = 0.1
    got = sgd_sparse_update(table, idx, grad_y, lr=lr, mode=CombineMode.CONCAT)

    def loss(t):
        out = embedding_lookup(t, idx, mode=CombineMode.CONCAT, backend="xla")
        return jnp.sum(out * grad_y)

    want = table - lr * jax.grad(loss)(table)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_adagrad_unique_cap_and_overflow():
    rng = np.random.default_rng(40)
    V, W, B, H = 400, 8, 24, 6
    table = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    accum = rowwise_adagrad_init(V) + 0.25
    idx = jnp.asarray(rng.integers(0, V, (B, H)).astype(np.int32))
    gy = jnp.asarray(rng.standard_normal((B, W)).astype(np.float32))
    ref_t, ref_a = rowwise_adagrad_sparse_update(table, accum, idx, gy, lr=0.1)
    # generous cap: fast path, same result
    t1, a1 = rowwise_adagrad_sparse_update(
        table, accum, idx, gy, lr=0.1, unique_cap=V
    )
    np.testing.assert_allclose(np.asarray(t1), np.asarray(ref_t), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(ref_a), rtol=2e-5, atol=2e-5)
    # tiny cap: overflow fallback, still exact
    t2, a2 = rowwise_adagrad_sparse_update(
        table, accum, idx, gy, lr=0.1, unique_cap=8
    )
    np.testing.assert_allclose(np.asarray(t2), np.asarray(ref_t), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(ref_a), rtol=2e-5, atol=2e-5)


def test_sparse_updates_overflow_drop_matches_when_capacity_ok():
    """overflow='drop' equals the exact path whenever capacities hold."""
    import numpy as np
    rng = np.random.default_rng(41)
    V, W, B, H, HEAD = 500, 32, 64, 8, 16
    from cuembed_tpu.ops.tiered import TieredConfig
    cfg = TieredConfig(hot_rows=100, chunk_elems=64, cold_slots=64,
                       mxu_head_rows=HEAD, mid_slots=64)
    table = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, V, (B, H)).astype(np.int32))
    gy = jnp.asarray(rng.standard_normal((B, W)).astype(np.float32))

    a = sgd_sparse_update(table, idx, gy, lr=0.1, tiered_cfg=cfg)
    b = sgd_sparse_update(table, idx, gy, lr=0.1, tiered_cfg=cfg,
                          overflow="drop")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)

    accum = rowwise_adagrad_init(V)
    t1, a1 = rowwise_adagrad_sparse_update(
        table, accum, idx, gy, lr=0.1, tiered_cfg=cfg, unique_cap=B * H)
    t2, a2 = rowwise_adagrad_sparse_update(
        table, accum, idx, gy, lr=0.1, tiered_cfg=cfg, unique_cap=B * H,
        overflow="drop")
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                               rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# Sparse lazy Adam
# ---------------------------------------------------------------------------


def _lazy_adam_ref(table, m, v, step, idx, gy, lr, b1, b2, eps,
                   offsets=None, weights=None, mean=False):
    """Numpy golden model: touched rows only, G_r = sum of coeff*gy."""
    table, m, v = table.copy(), m.copy(), v.copy()
    V, W = table.shape
    G = np.zeros((V, W), np.float64)
    touched = np.zeros(V, bool)
    if offsets is None:
        B, H = idx.shape
        for b in range(B):
            for h in range(H):
                c = 1.0 if weights is None else weights[b, h]
                if mean:
                    c /= H
                if c != 0:
                    G[idx[b, h]] += c * gy[b]
                    touched[idx[b, h]] = True
    else:
        B = offsets.shape[0] - 1
        for b in range(B):
            hot = offsets[b + 1] - offsets[b]
            for p in range(offsets[b], offsets[b + 1]):
                c = 1.0 if weights is None else weights[p]
                if mean and hot > 0:
                    c /= hot
                if c != 0:
                    G[idx[p]] += c * gy[b]
                    touched[idx[p]] = True
    r = touched
    m[r] = b1 * m[r] + (1 - b1) * G[r]
    v[r] = b2 * v[r] + (1 - b2) * G[r] ** 2
    upd = lr * (m[r] / (1 - b1**step)) / (np.sqrt(v[r] / (1 - b2**step)) + eps)
    table[r] -= upd.astype(np.float32)
    return table, m, v


@pytest.mark.parametrize("weighted", [False, True])
def test_adam_sparse_matches_golden(weighted):
    from cuembed_tpu.train import adam_init, adam_sparse_update

    rng = np.random.default_rng(40)
    V, W, B, H = 128, 16, 24, 4
    table = rng.standard_normal((V, W)).astype(np.float32)
    idx = rng.integers(0, V, (B, H)).astype(np.int32)
    gy = rng.standard_normal((B, W)).astype(np.float32)
    w = (
        rng.standard_normal((B, H)).astype(np.float32)
        if weighted else None
    )
    jt = jnp.asarray(table)
    jm, jv = adam_init(V, W)
    rt, rm, rv = table, np.zeros((V, W)), np.zeros((V, W))
    for step in (1, 2, 3):
        jt, jm, jv = adam_sparse_update(
            jt, jm, jv, jnp.int32(step), jnp.asarray(idx),
            jnp.asarray(gy), lr=0.05,
            weights=None if w is None else jnp.asarray(w),
        )
        rt, rm, rv = _lazy_adam_ref(
            rt, rm, rv, step, idx, gy, 0.05, 0.9, 0.999, 1e-8, weights=w
        )
    np.testing.assert_allclose(np.asarray(jt), rt, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jm), rm, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jv), rv, rtol=1e-4, atol=1e-6)


def test_adam_sparse_csr_and_untouched_rows():
    from cuembed_tpu.train import adam_init, adam_sparse_update

    rng = np.random.default_rng(41)
    V, W, B = 128, 16, 24
    table = rng.standard_normal((V, W)).astype(np.float32)
    hots = rng.integers(0, 5, B)
    offs = np.concatenate([[0], np.cumsum(hots)]).astype(np.int32)
    vals = rng.integers(0, V // 2, max(int(offs[-1]), 1)).astype(np.int32)
    gy = rng.standard_normal((B, W)).astype(np.float32)
    jt = jnp.asarray(table)
    jm, jv = adam_init(V, W)
    jt, jm, jv = adam_sparse_update(
        jt, jm, jv, jnp.int32(1), jnp.asarray(vals), jnp.asarray(gy),
        lr=0.05, offsets=jnp.asarray(offs), mode=CombineMode.MEAN,
    )
    rt, rm, rv = _lazy_adam_ref(
        table, np.zeros((V, W)), np.zeros((V, W)), 1, vals, gy,
        0.05, 0.9, 0.999, 1e-8, offsets=offs, mean=True,
    )
    np.testing.assert_allclose(np.asarray(jt), rt, rtol=1e-4, atol=1e-5)
    # rows >= V//2 never appear: table and moments untouched (lazy)
    np.testing.assert_array_equal(
        np.asarray(jt)[V // 2:], table[V // 2:]
    )
    np.testing.assert_array_equal(np.asarray(jm)[V // 2:], 0.0)


def test_adam_sparse_step_zero_is_clamped_not_nan():
    # A 0-based step counter's first call must behave as step=1, not
    # divide bias correction by zero and scatter NaN into the table.
    from cuembed_tpu.train import adam_init, adam_sparse_update

    rng = np.random.default_rng(42)
    V, W, B, H = 64, 16, 8, 4
    table = rng.standard_normal((V, W)).astype(np.float32)
    idx = rng.integers(0, V, (B, H)).astype(np.int32)
    gy = rng.standard_normal((B, W)).astype(np.float32)
    jm, jv = adam_init(V, W)
    t0, m0, v0 = adam_sparse_update(
        jnp.asarray(table), jm, jv, jnp.int32(0), jnp.asarray(idx),
        jnp.asarray(gy), lr=0.05,
    )
    jm, jv = adam_init(V, W)
    t1, m1, v1 = adam_sparse_update(
        jnp.asarray(table), jm, jv, jnp.int32(1), jnp.asarray(idx),
        jnp.asarray(gy), lr=0.05,
    )
    assert np.isfinite(np.asarray(t0)).all()
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
