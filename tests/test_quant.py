"""Int8 hot head: quantization bound + exact plumbing through the tiers."""

import numpy as np
import pytest

import jax.numpy as jnp

from cuembed_tpu.ops.lookup_xla import embedding_forward_xla
from cuembed_tpu.ops.quant import (
    dequant_rows,
    extract_scales,
    int8_head_rows,
    quantize_head,
)
from cuembed_tpu.ops.tiered import TieredConfig, tiered_forward
from cuembed_tpu.types import CombineMode


def test_quantize_roundtrip_bound():
    rng = np.random.default_rng(0)
    rows = rng.standard_normal((64, 256)).astype(np.float32) * np.exp(
        rng.standard_normal((64, 1))
    )
    qh = quantize_head(jnp.asarray(rows))
    deq = np.asarray(dequant_rows(qh))
    amax = np.abs(rows).max(axis=1, keepdims=True)
    # documented bound: elementwise error <= max|row| / 254
    assert (np.abs(deq - rows) <= amax / 254 + 1e-7).all()
    # inline scales decode exactly
    np.testing.assert_allclose(
        np.asarray(extract_scales(qh.data)), amax[:, 0] / 127.0, rtol=1e-6
    )


def test_int8_head_rows_budget():
    assert int8_head_rows(256, 108 * 1024 * 1024) * (256 + 128) <= (
        108 * 1024 * 1024
    )


@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN])
@pytest.mark.parametrize("weighted", [False, True])
def test_tiered_int8_matches_dequant_golden(mode, weighted):
    """The int8 path must equal the EXACT lookup against a composite
    table (exact head/cold rows, dequantized mid rows) — this pins the
    scale plumbing, not just a loose bound."""
    if weighted and mode != CombineMode.SUM:
        pytest.skip("weights only with SUM")
    rng = np.random.default_rng(1)
    V, B, H, W = 4000, 64, 8, 256
    table = rng.standard_normal((V, W)).astype(np.float32)
    cfg = TieredConfig(
        hot_rows=512, chunk_elems=64, cold_slots=64,
        mxu_head_rows=64, mid_slots=64,
    )
    q_rows = 1024  # int8 coverage of 2x the exact hot budget
    qh = quantize_head(jnp.asarray(table[:q_rows]))
    r = rng.random((B, H))
    idx = np.minimum((r ** 3 * V).astype(np.int32), V - 1)
    w = (
        jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
        if weighted
        else None
    )
    got = tiered_forward(
        jnp.asarray(table), jnp.asarray(idx), None, w,
        mode=mode, cfg=cfg, q_head=qh,
    )
    composite = table.copy()
    head = cfg.mxu_head_rows
    composite[head:q_rows] = np.asarray(dequant_rows(qh))[head:q_rows]
    want = embedding_forward_xla(
        jnp.asarray(composite), jnp.asarray(idx), None, w, mode=mode
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_tiered_int8_error_bound_vs_exact():
    """Pooled error vs the exact lookup obeys sum-of-row-bounds."""
    rng = np.random.default_rng(2)
    V, B, H, W = 4000, 48, 8, 256
    table = rng.standard_normal((V, W)).astype(np.float32)
    cfg = TieredConfig(
        hot_rows=512, chunk_elems=64, cold_slots=64,
        mxu_head_rows=64, mid_slots=64,
    )
    q_rows = 1024
    qh = quantize_head(jnp.asarray(table[:q_rows]))
    r = rng.random((B, H))
    idx = np.minimum((r ** 3 * V).astype(np.int32), V - 1)
    got = np.asarray(
        tiered_forward(
            jnp.asarray(table), jnp.asarray(idx), mode=CombineMode.SUM,
            cfg=cfg, q_head=qh,
        )
    )
    want = np.asarray(
        embedding_forward_xla(jnp.asarray(table), jnp.asarray(idx))
    )
    amax = np.abs(table).max(axis=1)
    in_mid = (idx >= cfg.mxu_head_rows) & (idx < q_rows)
    bound = (amax[idx] / 254 * in_mid).sum(axis=1) + 1e-4
    assert (np.abs(got - want).max(axis=1) <= bound).all()


def test_embedding_table_int8_flow():
    from cuembed_tpu.table import EmbeddingTable

    rng = np.random.default_rng(3)
    V, B, H, W = 6000, 64, 8, 128
    raw = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    # small hot budget so the int8 head is a strict subset of the table
    t = EmbeddingTable(raw, hot_bytes=512 * W * 4,
                       vmem_table_bytes=256 * 1024)
    idx = np.minimum((rng.random((B, H)) ** 3 * V).astype(np.int32), V - 1)
    t.calibrate(idx)
    if t.tiered_cfg is None:
        pytest.skip("table fits VMEM at this size")
    t.enable_int8_head(idx)
    assert t._q_cfg.hot_rows > t.tiered_cfg.hot_rows  # 2x+ coverage
    exact = np.asarray(t.lookup(idx))
    lossy = np.asarray(t.lookup(idx, use_int8_head=True))
    # documented bound: sum over mid-tier hits of max|row|/254
    logical = np.asarray(t.logical_table())
    amax = np.abs(logical).max(axis=1)
    rm = t.remap[idx]
    in_mid = (rm >= t._q_cfg.mxu_head_rows) & (rm < t._q_cfg.hot_rows)
    bound = (amax[rm] / 254 * in_mid).sum(axis=1) + 1e-4
    assert (np.abs(lossy - exact).max(axis=1) <= bound).all()


def test_int8_head_refuses_grad():
    """tiered_forward(q_head=...) is forward-only: jax.grad must raise,
    not silently drop the quantized mid tier's table gradient."""
    import jax

    from cuembed_tpu.ops.quant import quantize_head
    from cuembed_tpu.ops.tiered import TieredConfig, tiered_forward

    rng = np.random.default_rng(4)
    V, B, H, W = 512, 32, 4, 128
    table = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, V, (B, H)).astype(np.int32))
    cfg = TieredConfig(hot_rows=64, chunk_elems=128, cold_slots=128,
                       mxu_head_rows=32, mid_slots=128)
    qh = quantize_head(table[:128])

    def loss(t):
        return jnp.sum(tiered_forward(t, idx, None, None, cfg=cfg,
                                      q_head=qh) ** 2)

    with pytest.raises(NotImplementedError, match="serving-only"):
        jax.grad(loss)(table)


def _calibrated_table(rng, V=6000, W=128):
    from cuembed_tpu.table import EmbeddingTable

    raw = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    t = EmbeddingTable(raw, hot_bytes=512 * W * 4,
                       vmem_table_bytes=256 * 1024)
    idx = np.minimum((rng.random((64, 8)) ** 3 * V).astype(np.int32), V - 1)
    t.calibrate(idx)
    if t.tiered_cfg is None:
        pytest.skip("table fits VMEM at this size")
    return t, idx


def test_refresh_layout_invalidates_int8_head():
    """A reorder changes the physical row <-> category mapping; serving
    the stale int8 snapshot would return wrong categories. It must be
    dropped so the 'enable_int8_head() first' check fails loudly."""
    rng = np.random.default_rng(5)
    t, idx = _calibrated_table(rng)
    t.enable_int8_head(idx)
    assert t._q_head is not None
    t.observe(idx[::-1])
    t.refresh_layout(idx)
    assert t._q_head is None
    with pytest.raises(ValueError, match="enable_int8_head"):
        t.lookup(idx, use_int8_head=True)


def test_int8_lookup_validates_weights_mode():
    """use_int8_head must enforce the same weights-with-SUM contract as
    every other lookup path."""
    from cuembed_tpu.table import EmbeddingTable
    from cuembed_tpu.types import CombineMode

    rng = np.random.default_rng(6)
    V, W = 6000, 128
    raw = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    t = EmbeddingTable(raw, mode=CombineMode.MEAN,
                       hot_bytes=512 * W * 4, vmem_table_bytes=256 * 1024)
    idx = np.minimum((rng.random((64, 8)) ** 3 * V).astype(np.int32), V - 1)
    t.calibrate(idx)
    if t.tiered_cfg is None:
        pytest.skip("table fits VMEM at this size")
    t.enable_int8_head(idx)
    w = np.ones_like(idx, np.float32)
    with pytest.raises(ValueError, match="CombineMode.SUM"):
        t.lookup(idx, weights=w, use_int8_head=True)


def test_enable_int8_head_uncalibrated_widens_mid_slots():
    """Without fresh calibration the wider mid band must not inherit the
    exact layout's (smaller-band) mid_slots — that would chronically
    overflow and silently serve every batch from the exact fallback."""
    rng = np.random.default_rng(7)
    t, idx = _calibrated_table(rng)
    base = t.tiered_cfg
    t.enable_int8_head()  # no calibration indices
    assert t._q_cfg.hot_rows > base.hot_rows
    want = min(base.chunk_elems,
               -(-(base.mid_slots + base.cold_slots) // 8) * 8)
    assert t._q_cfg.mid_slots == want


def test_int8_serving_lookup_within_bound():
    """Whole-table int8 serving: pooled output within the per-element
    bound sum(|row_i| / 254) of the exact lookup; MEAN + weights too."""
    from cuembed_tpu import CombineMode, embedding_lookup
    from cuembed_tpu.ops.quant import int8_serving_lookup, quantize_head

    rng = np.random.default_rng(30)
    V, W, B, H = 512, 256, 32, 8
    table = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    qt = quantize_head(table)
    idx = jnp.asarray(rng.integers(0, V, (B, H)).astype(np.int32))
    for mode, w in [
        (CombineMode.SUM, None),
        (CombineMode.MEAN, None),
        (
            CombineMode.SUM,
            jnp.asarray(rng.standard_normal((B, H)).astype(np.float32)),
        ),
    ]:
        got = int8_serving_lookup(qt, idx, w, mode=mode)
        want = embedding_lookup(table, idx, w, mode=mode, backend="xla")
        row_max = np.abs(np.asarray(table)).max(axis=1)
        coeff = np.ones((B, H)) if w is None else np.abs(np.asarray(w))
        if mode == CombineMode.MEAN:
            coeff = coeff / H
        bound = (
            (row_max[np.asarray(idx)] / 254.0 * coeff).sum(axis=1) + 1e-5
        )
        err = np.abs(np.asarray(got) - np.asarray(want)).max(axis=1)
        assert (err <= bound).all(), (err.max(), bound.min())


def test_int8_serving_lookup_refuses_grad():
    import jax

    from cuembed_tpu.ops.quant import int8_serving_lookup, quantize_head

    table = jnp.ones((16, 128), jnp.float32)
    idx = jnp.zeros((4, 2), jnp.int32)

    def loss(t):
        return jnp.sum(int8_serving_lookup(quantize_head(t), idx))

    with pytest.raises(NotImplementedError, match="serving-only"):
        jax.grad(loss)(table)
