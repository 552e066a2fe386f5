"""Parity tests for the tiered (hot/cold) forward path.

The tiered path reassociates per-sample accumulation (hot positions in
order, cold positions after), so parity vs the golden model uses a small
tolerance instead of the bitwise discipline of the XLA path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cuembed_tpu.ops.tiered import TieredConfig, auto_config, tiered_forward
from cuembed_tpu.ref.forward import embedding_forward_ref
from cuembed_tpu.types import CombineMode


def _mixed_indices(rng, batch, hotness, hot_rows, num_categories, cold_p):
    hot = rng.integers(0, hot_rows, (batch, hotness))
    cold = rng.integers(hot_rows, num_categories, (batch, hotness))
    take_cold = rng.random((batch, hotness)) < cold_p
    return np.where(take_cold, cold, hot).astype(np.int32)


@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN])
@pytest.mark.parametrize("weighted", [False, True])
@pytest.mark.parametrize(
    "batch,hotness,chunk_elems,cold_slots",
    [
        (64, 8, 64, 32),     # several chunks
        (33, 7, 56, 24),     # batch*hotness not divisible by chunk_elems
        (4, 16, 64, 64),     # one chunk, capacity == chunk
    ],
)
def test_tiered_fixed_matches_golden(mode, weighted, batch, hotness,
                                     chunk_elems, cold_slots):
    if weighted and mode != CombineMode.SUM:
        pytest.skip("weights only with SUM")
    rng = np.random.default_rng(7)
    V, W, C = 500, 48, 100
    table = rng.standard_normal((V, W)).astype(np.float32)
    idx = _mixed_indices(rng, batch, hotness, C, V, cold_p=0.3)
    w = rng.standard_normal((batch, hotness)).astype(np.float32) if weighted else None

    ref = embedding_forward_ref(table, idx, weights=w, mode=mode)
    cfg = TieredConfig(hot_rows=C, chunk_elems=chunk_elems, cold_slots=cold_slots)
    out = tiered_forward(
        jnp.asarray(table), jnp.asarray(idx),
        weights=None if w is None else jnp.asarray(w),
        mode=mode, cfg=cfg,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN])
@pytest.mark.parametrize("weighted", [False, True])
def test_tiered_csr_matches_golden(mode, weighted):
    if weighted and mode != CombineMode.SUM:
        pytest.skip("weights only with SUM")
    rng = np.random.default_rng(11)
    V, W, C, batch = 400, 32, 80, 37
    table = rng.standard_normal((V, W)).astype(np.float32)
    hots = rng.integers(0, 9, batch)
    hots[3] = 0  # zero-hotness sample (MEAN => exact zero)
    offsets = np.concatenate([[0], np.cumsum(hots)]).astype(np.int32)
    nnz = int(offsets[-1])
    cap = nnz + 13  # padding beyond offsets[-1]
    flat = _mixed_indices(rng, 1, cap, C, V, cold_p=0.4).reshape(-1)
    w = rng.standard_normal((cap,)).astype(np.float32) if weighted else None

    ref = embedding_forward_ref(
        table, flat[:nnz], offsets=offsets,
        weights=None if w is None else w[:nnz], mode=mode,
    )
    cfg = TieredConfig(hot_rows=C, chunk_elems=64, cold_slots=40)
    out = tiered_forward(
        jnp.asarray(table), jnp.asarray(flat), jnp.asarray(offsets),
        None if w is None else jnp.asarray(w),
        mode=mode, cfg=cfg,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_tiered_overflow_falls_back_exactly():
    """A batch whose cold count exceeds the static capacity must still be
    correct (lax.cond routes it to the exact path)."""
    rng = np.random.default_rng(3)
    V, W, C, batch, hotness = 300, 16, 50, 16, 8
    table = rng.standard_normal((V, W)).astype(np.float32)
    # every index cold -> every chunk overflows a capacity of 4
    idx = rng.integers(C, V, (batch, hotness)).astype(np.int32)
    cfg = TieredConfig(hot_rows=C, chunk_elems=32, cold_slots=4)
    ref = embedding_forward_ref(table, idx, mode=CombineMode.SUM)
    out = tiered_forward(jnp.asarray(table), jnp.asarray(idx),
                         mode=CombineMode.SUM, cfg=cfg)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_tiered_all_hot_and_all_cold():
    rng = np.random.default_rng(5)
    V, W, C, batch, hotness = 200, 24, 64, 12, 4
    table = rng.standard_normal((V, W)).astype(np.float32)
    cfg = TieredConfig(hot_rows=C, chunk_elems=16, cold_slots=16)
    for lo, hi in [(0, C), (C, V)]:
        idx = rng.integers(lo, hi, (batch, hotness)).astype(np.int32)
        ref = embedding_forward_ref(table, idx, mode=CombineMode.SUM)
        out = tiered_forward(jnp.asarray(table), jnp.asarray(idx),
                             mode=CombineMode.SUM, cfg=cfg)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_tiered_bf16_storage_fp32_accum():
    rng = np.random.default_rng(9)
    V, W, C, batch, hotness = 256, 32, 64, 8, 8
    table = rng.standard_normal((V, W)).astype(np.float32)
    tb = jnp.asarray(table).astype(jnp.bfloat16)
    idx = _mixed_indices(rng, batch, hotness, C, V, cold_p=0.25)
    cfg = TieredConfig(hot_rows=C, chunk_elems=64, cold_slots=32)
    ref = embedding_forward_ref(
        np.asarray(tb).astype(np.float32), idx, mode=CombineMode.SUM
    ).astype(np.float32)
    out = tiered_forward(tb, jnp.asarray(idx), mode=CombineMode.SUM, cfg=cfg)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), ref, rtol=2e-2, atol=2e-2
    )


def test_auto_config():
    # small table: served whole from VMEM -> no tiering
    assert auto_config(100_000, 32, 4, 8) is None
    cfg = auto_config(10_000_000, 256, 2, 64, cold_fraction=0.08)
    assert cfg is not None
    from cuembed_tpu.ops.tiered import DEFAULT_HOT_BYTES

    assert cfg.hot_rows * 256 * 2 <= DEFAULT_HOT_BYTES
    assert cfg.chunk_elems % 64 == 0
    assert cfg.cold_slots >= int(0.08 * cfg.chunk_elems)
    # 256 measured ~5% faster than 128 at the flagship (retune_r5)
    assert 0 < cfg.mxu_head_rows <= 256
    assert cfg.mid_slots >= int((1 - 0.08 - 0.45) * cfg.chunk_elems)
    # hotness larger than the nominal chunk width
    cfg2 = auto_config(10_000_000, 256, 2, 4096, cold_fraction=0.1)
    assert cfg2.chunk_elems == 4096


@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN])
@pytest.mark.parametrize("weighted", [False, True])
def test_tiered_backward_matches_xla(mode, weighted):
    """Gradients through the tiered custom_vjp (MXU-head backward +
    capacity-bounded scatter) must match the plain XLA backward."""
    if weighted and mode != CombineMode.SUM:
        pytest.skip("weights only with SUM")
    import jax
    from cuembed_tpu import embedding_lookup

    rng = np.random.default_rng(21)
    V, W, batch, hotness = 600, 32, 48, 8
    table = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    idx = jnp.asarray(
        _mixed_indices(rng, batch, hotness, 150, V, cold_p=0.3)
    )
    w = (
        jnp.asarray(rng.standard_normal((batch, hotness)).astype(np.float32))
        if weighted
        else None
    )
    cfg = TieredConfig(
        hot_rows=150, chunk_elems=64, cold_slots=48,
        mxu_head_rows=64, mid_slots=48,
    )

    def loss(t, backend, tc):
        out = embedding_lookup(
            t, idx, w, mode=mode, backend=backend, tiered_cfg=tc
        )
        return jnp.sum(out**2)

    g_t = jax.grad(loss)(table, "tiered", cfg)
    g_x = jax.grad(loss)(table, "xla", None)
    np.testing.assert_allclose(
        np.asarray(g_t), np.asarray(g_x), rtol=2e-5, atol=2e-5
    )
    if weighted:
        gw_t = jax.grad(lambda ww: jnp.sum(embedding_lookup(
            table, idx, ww, mode=mode, backend="tiered", tiered_cfg=cfg
        ) ** 2))(w)
        gw_x = jax.grad(lambda ww: jnp.sum(embedding_lookup(
            table, idx, ww, mode=mode, backend="xla"
        ) ** 2))(w)
        np.testing.assert_allclose(
            np.asarray(gw_t), np.asarray(gw_x), rtol=2e-5, atol=2e-5
        )


def test_tiered_backward_capacity_overflow():
    """rest_count > k_cap must route to the full scatter (exact)."""
    import jax
    from cuembed_tpu import embedding_lookup

    rng = np.random.default_rng(22)
    V, W, batch, hotness = 400, 16, 32, 8
    table = jnp.asarray(rng.standard_normal((V, W)).astype(np.float32))
    # everything outside the head -> rest_count == nnz > tiny k_cap
    idx = jnp.asarray(rng.integers(64, V, (batch, hotness)).astype(np.int32))
    cfg = TieredConfig(
        hot_rows=200, chunk_elems=32, cold_slots=4,
        mxu_head_rows=64, mid_slots=4,
    )

    def loss(t, backend, tc):
        return jnp.sum(embedding_lookup(
            t, idx, mode=CombineMode.SUM, backend=backend, tiered_cfg=tc
        ) ** 2)

    g_t = jax.grad(loss)(table, "tiered", cfg)
    g_x = jax.grad(loss)(table, "xla", None)
    np.testing.assert_allclose(
        np.asarray(g_t), np.asarray(g_x), rtol=2e-5, atol=2e-5
    )


def test_tier_fractions():
    from cuembed_tpu.utils.frequency import tier_fractions

    rng = np.random.default_rng(0)
    idx = rng.integers(0, 1000, (128, 16))
    head, cold = tier_fractions(idx, None, head_rows=100, hot_rows=500)
    assert 0 <= head <= np.mean(idx < 100)
    assert cold >= np.mean(idx >= 500)


def test_tiered_3tier_mid_overflow_falls_back():
    """Mid-tier capacity overflow must route to the exact path without
    double-counting the MXU head contribution."""
    rng = np.random.default_rng(13)
    V, W, C, batch, hotness = 400, 16, 200, 16, 8
    table = rng.standard_normal((V, W)).astype(np.float32)
    # everything in the mid tier [HEAD, C) with tiny mid capacity
    idx = rng.integers(64, C, (batch, hotness)).astype(np.int32)
    idx[0, 0] = 3    # a head hit
    idx[1, 0] = 300  # a cold hit
    cfg = TieredConfig(
        hot_rows=C, chunk_elems=32, cold_slots=8,
        mxu_head_rows=64, mid_slots=8,
    )
    ref = embedding_forward_ref(table, idx, mode=CombineMode.SUM)
    out = tiered_forward(jnp.asarray(table), jnp.asarray(idx),
                         mode=CombineMode.SUM, cfg=cfg)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN])
@pytest.mark.parametrize("weighted", [False, True])
@pytest.mark.parametrize("gs_cap", [8, 16, 3])
def test_tiered_csr_3tier_matches_golden(mode, weighted, gs_cap):
    """The scatter-free CSR combine (csr_chunk_samples > 0), including
    the span-overflow fallback (gs_cap=3 undersizes most chunks)."""
    if weighted and mode != CombineMode.SUM:
        pytest.skip("weights only with SUM")
    rng = np.random.default_rng(23)
    V, W, C, batch = 400, 32, 80, 53
    table = rng.standard_normal((V, W)).astype(np.float32)
    hots = rng.integers(0, 9, batch)
    hots[5] = 0
    offsets = np.concatenate([[0], np.cumsum(hots)]).astype(np.int32)
    nnz = int(offsets[-1])
    cap = nnz + 9
    flat = _mixed_indices(rng, 1, cap, C, V, cold_p=0.4).reshape(-1)
    w = rng.standard_normal((cap,)).astype(np.float32) if weighted else None

    ref = embedding_forward_ref(
        table, flat[:nnz], offsets=offsets,
        weights=None if w is None else w[:nnz], mode=mode,
    )
    cfg = TieredConfig(
        hot_rows=C, chunk_elems=64, cold_slots=40,
        csr_chunk_samples=gs_cap,
    )
    out = tiered_forward(
        jnp.asarray(table), jnp.asarray(flat), jnp.asarray(offsets),
        None if w is None else jnp.asarray(w), mode=mode, cfg=cfg,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_tiered_csr_3tier_bitwise_integer():
    """Integer-exact data: the reassociated CSR combine is bitwise."""
    rng = np.random.default_rng(29)
    V, W, C, batch = 300, 16, 64, 41
    table = rng.integers(-8, 9, (V, W)).astype(np.float32)
    hots = rng.integers(0, 7, batch)
    offsets = np.concatenate([[0], np.cumsum(hots)]).astype(np.int32)
    nnz = int(offsets[-1])
    flat = rng.integers(0, V, max(nnz, 1)).astype(np.int32)

    ref = embedding_forward_ref(
        table, flat, offsets=offsets, mode=CombineMode.SUM
    )
    cfg = TieredConfig(
        hot_rows=C, chunk_elems=32, cold_slots=32, csr_chunk_samples=12
    )
    out = tiered_forward(
        jnp.asarray(table), jnp.asarray(flat), jnp.asarray(offsets),
        mode=CombineMode.SUM, cfg=cfg,
    )
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_tiered_forward_rejects_weighted_mean():
    """Same contract as every other lookup path (review finding)."""
    import pytest as _pytest

    from cuembed_tpu.ops.tiered import TieredConfig, tiered_forward

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((512, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 512, (16, 4)).astype(np.int32))
    w = jnp.ones((16, 4), jnp.float32)
    cfg = TieredConfig(hot_rows=64, chunk_elems=64, cold_slots=64,
                       mxu_head_rows=32, mid_slots=64)
    with _pytest.raises(ValueError, match="CombineMode.SUM"):
        tiered_forward(table, idx, None, w, cfg=cfg,
                       mode=CombineMode.MEAN)


def test_backward_seg_prefix_unaligned_kcap():
    """bwd_run_frac large relative to nonhead_frac: the segment prefix S
    must clamp to a chunk MULTIPLE at or below k_cap, not crash in the
    reshape (review finding: S=min(aligned, k_cap) left S unaligned)."""
    from cuembed_tpu.ops.lookup_xla import (
        embedding_backward_compressed_tiered,
        embedding_backward_compressed_xla,
    )
    from cuembed_tpu.ops.tiered import TieredConfig
    from cuembed_tpu.ops.transforms import (
        extract_row_ids_from_fixed,
        transpose,
    )

    rng = np.random.default_rng(1)
    V, B, H, W = 4096, 64, 8, 32
    idx = jnp.asarray(rng.integers(0, V, (B, H)).astype(np.int32))
    gy = jnp.asarray(rng.standard_normal((B, W)).astype(np.float32))
    sids = extract_row_ids_from_fixed(B, H)
    t_idx, t_sid, _ = transpose(sids.astype(jnp.int32), idx.reshape(-1),
                                None)
    # nonhead_frac -> k_cap = ceil8(0.31 * 512) = 160 (not a multiple of
    # the 64-element seg chunk); bwd_run_frac covers more than that.
    cfg = TieredConfig(
        hot_rows=256, chunk_elems=128, cold_slots=128, mxu_head_rows=32,
        mid_slots=128, nonhead_frac=0.31, bwd_seg_chunk=64,
        bwd_seg_slots=64, bwd_run_frac=0.9,
    )
    got = embedding_backward_compressed_tiered(
        gy, V, idx, None, t_idx, t_sid, None, cfg
    )
    want = embedding_backward_compressed_xla(gy, t_idx, t_sid, None)
    # compare dense reconstructions (row order differs between paths)
    def dense(out):
        cap = out.rows.shape[0]
        valid = np.arange(cap) < int(out.num_unique)
        d = np.zeros((V, W), np.float32)
        uniq = np.asarray(out.unique_indices)
        rows = np.asarray(out.rows, np.float32)
        ok = valid & (uniq < V)
        d[uniq[ok]] += rows[ok]
        return d

    np.testing.assert_allclose(dense(got), dense(want), rtol=1e-5,
                               atol=1e-5)


def test_calibrate_capacity_factor():
    """Routed capacity calibration: uniform traffic needs little slack,
    frequency-ordered zipf (hot rows on shard 0) needs a lot; the
    returned factor actually covers the stated overflow quantile."""
    from cuembed_tpu.utils.frequency import calibrate_capacity_factor

    rng = np.random.default_rng(0)
    uniform = np.ones(10_000)
    f_uni = calibrate_capacity_factor(
        uniform, 8, 4096, 8, trials=50, seed=1
    )
    zipf = 1.0 / np.arange(1, 10_001) ** 1.2
    f_zipf = calibrate_capacity_factor(
        zipf, 8, 4096, 8, trials=50, seed=1
    )
    assert 1.0 < f_uni < 2.0 < f_zipf

    # the calibrated cap covers fresh draws at ~the target rate
    p = zipf / zipf.sum()
    rows_per = -(-10_000 // 8)
    nnz_l = 4096 * 8 // 8
    cap = f_zipf * nnz_l / 8
    overflows = 0
    for _ in range(50):
        draws = rng.choice(10_000, size=(8, nnz_l), p=p)
        per = np.stack([
            np.bincount(np.minimum(d // rows_per, 7), minlength=8)
            for d in draws
        ])
        overflows += int(per.max() > cap)
    assert overflows <= 5  # ~1% target; generous bound for 50 trials

    with pytest.raises(ValueError, match="counts"):
        calibrate_capacity_factor(np.zeros(10), 8, 64, 4)
    assert calibrate_capacity_factor(uniform, 1, 64, 4) == 1.0


# ---------------------------------------------------------------------------
# tiering_profitable: the measured batch-shape gate (round-4 sweep law)
# ---------------------------------------------------------------------------


def test_tiering_profitable_law():
    from cuembed_tpu.ops.tiered import tiering_profitable

    # Winners in benchmarks/results_v5e_r4.csv (tiered 1.7-3.6x faster):
    assert tiering_profitable(32768 * 16, 16)
    assert tiering_profitable(1024 * 64, 64)
    assert tiering_profitable(131072 * 16, 16)
    # Losers (plain gather faster, up to 9x at hotness 1):
    assert not tiering_profitable(131072 * 1, 1)     # H=1: no combine reuse
    assert not tiering_profitable(1024 * 16, 16)     # 16K positions: chunk
    assert not tiering_profitable(1024 * 1, 1)       # machinery dominates


def test_auto_dispatch_gates_unprofitable_tiering(monkeypatch):
    """backend='auto' + tiered_cfg must route around the tiered engine
    outside the profitable region (and through it inside), while
    backend='tiered' stays an explicit override."""
    import jax

    from cuembed_tpu.ops import dispatch

    monkeypatch.setattr(dispatch, "_on_tpu", lambda: True)
    calls = []
    real = dispatch.tiered_forward

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(dispatch, "tiered_forward", spy)

    rng = np.random.default_rng(3)
    table = jnp.asarray(rng.standard_normal((512, 128)), jnp.float32)
    cfg = TieredConfig(
        hot_rows=64, chunk_elems=64, cold_slots=64,
        mxu_head_rows=16, mid_slots=64,
    )

    # Unprofitable shape (hotness 1): auto takes the XLA path.
    idx1 = jnp.asarray(rng.integers(0, 512, (64, 1)).astype(np.int32))
    dispatch.forward(
        table, idx1, None, None, mode=CombineMode.SUM,
        backend="auto", tiered_cfg=cfg,
    )
    assert not calls

    # Same shape, explicit backend='tiered': forced through the engine.
    dispatch.forward(
        table, idx1, None, None, mode=CombineMode.SUM,
        backend="tiered", tiered_cfg=cfg,
    )
    assert len(calls) == 1

    # Profitable shape (>= 32768 positions, hotness >= 4): auto tiers.
    idx2 = jnp.asarray(rng.integers(0, 512, (4096, 8)).astype(np.int32))
    dispatch.forward(
        table, idx2, None, None, mode=CombineMode.SUM,
        backend="auto", tiered_cfg=cfg,
    )
    assert len(calls) == 2


# ---------------------------------------------------------------------------
# Round-5 CSR engine: live-capacity slicing + combine-only mode
# ---------------------------------------------------------------------------


def _csr_problem(rng, V, C, batch, max_hot, cap_slack, cold_p=0.4):
    hots = rng.integers(0, max_hot + 1, batch)
    offsets = np.concatenate([[0], np.cumsum(hots)]).astype(np.int32)
    nnz = int(offsets[-1])
    cap = nnz + cap_slack
    flat = _mixed_indices(rng, 1, cap, C, V, cold_p=cold_p).reshape(-1)
    return flat, offsets, nnz, cap


@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN])
@pytest.mark.parametrize("weighted", [False, True])
@pytest.mark.parametrize("combine", [True, False])
def test_csr_live_cap_fast_path(mode, weighted, combine):
    """csr_live_cap well above offsets[-1]: the sliced fast path serves
    the batch exactly, for both the scatter-free combine and the
    segment-sum engines."""
    if weighted and mode != CombineMode.SUM:
        pytest.skip("weights only with SUM")
    rng = np.random.default_rng(31)
    V, W, C, batch = 400, 32, 80, 61
    table = rng.standard_normal((V, W)).astype(np.float32)
    flat, offsets, nnz, cap = _csr_problem(rng, V, C, batch, 8, 257)
    w = rng.standard_normal((cap,)).astype(np.float32) if weighted else None

    ref = embedding_forward_ref(
        table, flat[:nnz], offsets=offsets,
        weights=None if w is None else w[:nnz], mode=mode,
    )
    live_cap = -(-int(nnz * 1.1) // 64) * 64
    assert live_cap < cap, "test needs real slicing to exercise the path"
    cfg = TieredConfig(
        hot_rows=C, chunk_elems=64, cold_slots=48,
        csr_chunk_samples=24 if combine else 0,
        csr_live_cap=live_cap,
    )
    out = tiered_forward(
        jnp.asarray(table), jnp.asarray(flat), jnp.asarray(offsets),
        None if w is None else jnp.asarray(w), mode=mode, cfg=cfg,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("combine", [True, False])
def test_csr_live_cap_overflow_falls_back(combine):
    """offsets[-1] past csr_live_cap: the lax.cond exact path serves the
    batch (a sliced fast path would silently drop tail positions)."""
    rng = np.random.default_rng(37)
    V, W, C, batch = 400, 32, 80, 61
    table = rng.standard_normal((V, W)).astype(np.float32)
    flat, offsets, nnz, cap = _csr_problem(rng, V, C, batch, 8, 3)
    assert nnz > 128

    ref = embedding_forward_ref(
        table, flat[:nnz], offsets=offsets, mode=CombineMode.SUM
    )
    cfg = TieredConfig(
        hot_rows=C, chunk_elems=64, cold_slots=48,
        csr_chunk_samples=24 if combine else 0,
        csr_live_cap=64,  # far below nnz -> must fall back
    )
    out = tiered_forward(
        jnp.asarray(table), jnp.asarray(flat), jnp.asarray(offsets),
        mode=CombineMode.SUM, cfg=cfg,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("weighted", [False, True])
def test_csr_combine_only_no_classing(weighted):
    """csr_combine_config (hot_rows >= V): no sort, no frequency order —
    one full-table gather + the per-chunk combine. Exact for any id
    distribution."""
    from cuembed_tpu.ops.tiered import csr_combine_config

    rng = np.random.default_rng(41)
    V, W, batch = 500, 16, 57
    table = rng.standard_normal((V, W)).astype(np.float32)
    hots = rng.integers(0, 13, batch)
    offsets = np.concatenate([[0], np.cumsum(hots)]).astype(np.int32)
    nnz = int(offsets[-1])
    cap = nnz + 31
    flat = rng.integers(0, V, cap).astype(np.int32)
    w = rng.standard_normal((cap,)).astype(np.float32) if weighted else None

    cfg = csr_combine_config(V, 6, chunk_elems=64, live_cap=nnz + 8)
    assert cfg is not None and cfg.hot_rows >= V
    ref = embedding_forward_ref(
        table, flat[:nnz], offsets=offsets,
        weights=None if w is None else w[:nnz], mode=CombineMode.SUM,
    )
    out = tiered_forward(
        jnp.asarray(table), jnp.asarray(flat), jnp.asarray(offsets),
        None if w is None else jnp.asarray(w),
        mode=CombineMode.SUM, cfg=cfg,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_csr_combine_only_bitwise_integer():
    """Integer-exact data through the combine-only engine is bitwise:
    the bf16 one-hot carries only {0, 1} (exact) and accumulation is
    f32 via the MXU."""
    from cuembed_tpu.ops.tiered import csr_combine_config

    rng = np.random.default_rng(43)
    V, W, batch = 300, 16, 41
    table = rng.integers(-8, 9, (V, W)).astype(np.float32)
    hots = rng.integers(0, 7, batch)
    offsets = np.concatenate([[0], np.cumsum(hots)]).astype(np.int32)
    nnz = int(offsets[-1])
    flat = rng.integers(0, V, max(nnz, 1) + 5).astype(np.int32)

    cfg = csr_combine_config(V, 3, chunk_elems=32)
    assert cfg is not None and cfg.csr_chunk_samples > 0
    ref = embedding_forward_ref(
        table, flat[:nnz], offsets=offsets, mode=CombineMode.SUM
    )
    out = tiered_forward(
        jnp.asarray(table), jnp.asarray(flat), jnp.asarray(offsets),
        mode=CombineMode.SUM, cfg=cfg,
    )
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_csr_unpacked_sort_path():
    """Large-V unweighted CSR (1 + idx_bits + gs_bits > 31): the classed
    combine falls back to the 2-operand sort and still matches."""
    rng = np.random.default_rng(47)
    V, W, C, batch = 1 << 22, 4, 1 << 21, 61
    table = rng.standard_normal((2048, W)).astype(np.float32)
    # logical table is huge; back it by tiling a small physical block
    full = jnp.asarray(np.tile(table, (V // 2048, 1)))
    flat, offsets, nnz, cap = _csr_problem(rng, V, C, batch, 8, 65)

    gs = 512  # 1 + 22 + 10 bits > 31 -> unpacked path
    cfg = TieredConfig(
        hot_rows=C, chunk_elems=64, cold_slots=64, csr_chunk_samples=gs
    )
    ref = embedding_forward_ref(
        np.asarray(full), flat[:nnz], offsets=offsets, mode=CombineMode.SUM
    )
    out = tiered_forward(
        full, jnp.asarray(flat), jnp.asarray(offsets),
        mode=CombineMode.SUM, cfg=cfg,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_calibrate_csr_fields():
    from cuembed_tpu.utils.calibration import calibrate_csr_fields

    cfg = TieredConfig(hot_rows=100, chunk_elems=64)
    rng = np.random.default_rng(53)
    offs = []
    for seed in range(3):
        hots = np.random.default_rng(seed).integers(0, 9, 200)
        offs.append(np.concatenate([[0], np.cumsum(hots)]).astype(np.int32))
    cap = 200 * 8
    out = calibrate_csr_fields(cfg, offs, cap, margin=1.1)
    live_max = max(int(o[-1]) for o in offs)
    # live cap: covers the max observed live count + margin, chunk-aligned
    assert out.csr_live_cap >= live_max
    assert out.csr_live_cap % 64 == 0 or out.csr_live_cap == cap
    assert out.csr_live_cap <= cap
    # span: with ~4 avg hotness a 64-position chunk spans ~16-40 samples
    assert 0 < out.csr_chunk_samples <= 64
    # a runtime batch within the calibrated capacities takes the fast path
    # and matches (full pipeline check)
    V, W = 400, 16
    table = np.random.default_rng(5).standard_normal((V, W)).astype(np.float32)
    o = offs[0]
    nnz = int(o[-1])
    flat = np.random.default_rng(6).integers(0, V, cap).astype(np.int32)
    ref = embedding_forward_ref(
        table, flat[:nnz], offsets=o, mode=CombineMode.SUM
    )
    res = tiered_forward(
        jnp.asarray(table), jnp.asarray(flat), jnp.asarray(o),
        mode=CombineMode.SUM, cfg=out,
    )
    np.testing.assert_allclose(np.asarray(res), ref, rtol=2e-5, atol=2e-5)


def test_csr_combine_config_gates_low_hotness():
    from cuembed_tpu.ops.tiered import csr_combine_config

    # avg hotness 1: the one-hot capacity approaches the chunk size —
    # no combine config (the segment-sum path is faster).
    assert csr_combine_config(10_000, 1) is None
    cfg = csr_combine_config(10_000, 16)
    assert cfg is not None and cfg.csr_chunk_samples > 0
