"""Line-packed narrow-table tests: parity vs golden, grads, EmbeddingBag."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cuembed_tpu import CombineMode, embedding_lookup
from cuembed_tpu.models.embedding_bag import EmbeddingBag
from cuembed_tpu.ops.narrow import (
    narrow_lookup,
    pack_narrow,
    packing_factor,
    unpack_narrow,
)
from cuembed_tpu.ref.forward import embedding_forward_ref


def test_pack_roundtrip():
    rng = np.random.default_rng(0)
    for v, w in ((100, 32), (101, 16), (7, 64), (50, 128), (10, 48)):
        t = jnp.asarray(rng.standard_normal((v, w)).astype(np.float32))
        packed = pack_narrow(t)
        back = unpack_narrow(packed, v, w)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(t))
        k = packing_factor(w)
        assert packed.shape == ((v + k - 1) // k, k * w) if k > 1 else (v, w)


@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN,
                                  CombineMode.CONCAT])
@pytest.mark.parametrize("width", [16, 32, 64])
def test_narrow_lookup_matches_golden(mode, width):
    rng = np.random.default_rng(1)
    V, B, H = 333, 24, 6
    table = rng.standard_normal((V, width)).astype(np.float32)
    idx = rng.integers(0, V, (B, H)).astype(np.int32)
    ref = embedding_forward_ref(table, idx, mode=mode)
    got = narrow_lookup(
        pack_narrow(jnp.asarray(table)), V, width, jnp.asarray(idx), mode=mode
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=2e-6)


def test_narrow_lookup_csr_weighted():
    rng = np.random.default_rng(2)
    V, width, B = 200, 32, 16
    table = rng.standard_normal((V, width)).astype(np.float32)
    hots = rng.integers(0, 5, B)
    offsets = np.concatenate([[0], np.cumsum(hots)]).astype(np.int32)
    cap = int(offsets[-1]) + 3
    flat = rng.integers(0, V, cap).astype(np.int32)
    w = rng.standard_normal(cap).astype(np.float32)
    ref = embedding_forward_ref(
        table, flat[: int(offsets[-1])], offsets=offsets,
        weights=w[: int(offsets[-1])], mode=CombineMode.SUM,
    )
    got = narrow_lookup(
        pack_narrow(jnp.asarray(table)), V, width,
        jnp.asarray(flat), jnp.asarray(w), jnp.asarray(offsets),
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=2e-6)


def test_narrow_grad_matches_unpacked():
    rng = np.random.default_rng(3)
    V, width, B, H = 150, 32, 12, 4
    table = jnp.asarray(rng.standard_normal((V, width)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, V, (B, H)).astype(np.int32))
    gy = jnp.asarray(rng.standard_normal((B, width)).astype(np.float32))

    def loss_packed(p):
        return jnp.sum(narrow_lookup(p, V, width, idx) * gy)

    def loss_plain(t):
        return jnp.sum(embedding_lookup(t, idx, backend="xla") * gy)

    g_packed = jax.grad(loss_packed)(pack_narrow(table))
    g_plain = jax.grad(loss_plain)(table)
    np.testing.assert_allclose(
        np.asarray(unpack_narrow(g_packed, V, width)),
        np.asarray(g_plain),
        rtol=2e-5, atol=2e-6,
    )


def test_embedding_bag_packed_layout():
    rng = np.random.default_rng(4)
    bag = EmbeddingBag(300, 32, layout="packed")
    table = bag.init(jax.random.key(0))
    k = packing_factor(32)
    assert table.shape == (75, 128)
    idx = jnp.asarray(rng.integers(0, 300, (8, 4)).astype(np.int32))
    out = bag.apply(table, idx)
    ref = embedding_forward_ref(
        np.asarray(unpack_narrow(table, 300, 32)), np.asarray(idx),
        mode=CombineMode.SUM,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-6)


# ---------------------------------------------------------------------------
# Narrow x tiered composition (pack_k > 1): line-tiered lookups
# ---------------------------------------------------------------------------

def _tiny_cfg(**kw):
    from cuembed_tpu.ops.tiered import TieredConfig

    base = dict(hot_rows=512, chunk_elems=64, cold_slots=48,
                mxu_head_rows=64, mid_slots=64)
    base.update(kw)
    return TieredConfig(**base)


@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN])
@pytest.mark.parametrize("width,hotness", [(32, 8), (64, 4), (16, 16),
                                           (32, 1)])
def test_narrow_tiered_matches_golden(mode, width, hotness):
    rng = np.random.default_rng(10)
    V, B = 2000, 64
    cfg = _tiny_cfg(chunk_elems=max(64, hotness * 8))
    table = rng.standard_normal((V, width)).astype(np.float32)
    # power-law-ish skew so every tier is populated
    r = rng.random((B, hotness))
    idx = np.minimum((r ** 3 * V).astype(np.int32), V - 1)
    ref = embedding_forward_ref(table, idx, mode=mode)
    got = narrow_lookup(
        pack_narrow(jnp.asarray(table)), V, width, jnp.asarray(idx),
        mode=mode, tiered_cfg=cfg,
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=1e-5)


def test_narrow_tiered_weighted():
    rng = np.random.default_rng(11)
    V, B, H, width = 1500, 32, 8, 32
    cfg = _tiny_cfg()
    table = rng.standard_normal((V, width)).astype(np.float32)
    idx = np.minimum(
        (rng.random((B, H)) ** 3 * V).astype(np.int32), V - 1
    )
    w = rng.standard_normal((B, H)).astype(np.float32)
    ref = embedding_forward_ref(table, idx, weights=w, mode=CombineMode.SUM)
    got = narrow_lookup(
        pack_narrow(jnp.asarray(table)), V, width, jnp.asarray(idx),
        jnp.asarray(w), mode=CombineMode.SUM, tiered_cfg=cfg,
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=1e-5)


def test_narrow_tiered_overflow_exact_path():
    """Capacity overflow must fall back to the exact packed path."""
    rng = np.random.default_rng(12)
    V, B, H, width = 2000, 16, 8, 32
    # cold_slots=2 guarantees overflow for uniform indices
    cfg = _tiny_cfg(cold_slots=2, mid_slots=2)
    table = rng.standard_normal((V, width)).astype(np.float32)
    idx = rng.integers(0, V, (B, H)).astype(np.int32)
    ref = embedding_forward_ref(table, idx, mode=CombineMode.SUM)
    got = narrow_lookup(
        pack_narrow(jnp.asarray(table)), V, width, jnp.asarray(idx),
        mode=CombineMode.SUM, tiered_cfg=cfg,
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=1e-5)


def test_narrow_tiered_grad_matches_plain():
    rng = np.random.default_rng(13)
    V, B, H, width = 1200, 16, 4, 32
    cfg = _tiny_cfg()
    table = jnp.asarray(rng.standard_normal((V, width)).astype(np.float32))
    idx = jnp.asarray(np.minimum(
        (rng.random((B, H)) ** 3 * V).astype(np.int32), V - 1
    ))
    gy = jnp.asarray(rng.standard_normal((B, width)).astype(np.float32))

    def loss_tiered(p):
        return jnp.sum(
            narrow_lookup(p, V, width, idx, tiered_cfg=cfg) * gy
        )

    def loss_plain(t):
        return jnp.sum(embedding_lookup(t, idx, backend="xla") * gy)

    g_t = jax.grad(loss_tiered)(pack_narrow(table))
    g_p = jax.grad(loss_plain)(table)
    np.testing.assert_allclose(
        np.asarray(unpack_narrow(g_t, V, width)), np.asarray(g_p),
        rtol=2e-5, atol=1e-5,
    )


def test_dispatch_no_per_call_repack_for_big_narrow():
    """Auto dispatch must not route big raw narrow tables through the
    per-call repack; explicit backend='tiered' on them must raise."""
    from cuembed_tpu.ops import dispatch

    rng = np.random.default_rng(14)
    # > NARROW_INLINE_PACK_BYTES physically (V * 128 lanes * 4B)
    V = dispatch.NARROW_INLINE_PACK_BYTES // (128 * 4) + 7
    table = jnp.asarray(rng.standard_normal((V, 32)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, V, (8, 4)).astype(np.int32))
    out = embedding_lookup(table, idx)  # auto: plain gather, no repack
    ref = embedding_lookup(table, idx, backend="xla")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    with pytest.raises(ValueError, match="repack"):
        embedding_lookup(table, idx, backend="tiered",
                         tiered_cfg=_tiny_cfg())


def test_dispatch_inline_pack_small_narrow():
    """Small narrow tables still pack inline under auto (cheap relayout)."""
    rng = np.random.default_rng(15)
    V = 5000  # ~2.5 MB physical, under the inline threshold
    table = jnp.asarray(rng.standard_normal((V, 32)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, V, (16, 8)).astype(np.int32))
    out = embedding_lookup(table, idx)
    ref = embedding_forward_ref(np.asarray(table), np.asarray(idx),
                                mode=CombineMode.SUM)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-6)


def test_embedding_table_packed_tiered_lookup():
    """EmbeddingTable stores narrow tables packed and lookups stay exact
    through calibrate/refresh_layout."""
    from cuembed_tpu.table import EmbeddingTable

    rng = np.random.default_rng(16)
    V, B, H, width = 3000, 64, 8, 32
    raw = jnp.asarray(rng.standard_normal((V, width)).astype(np.float32))
    t = EmbeddingTable(raw, hot_bytes=512 * 128 * 4)
    assert t.table.shape == (V // 4, 128)
    assert t.num_categories == V and t.width == width
    idx = np.minimum((rng.random((B, H)) ** 3 * V).astype(np.int32), V - 1)
    ref = embedding_forward_ref(np.asarray(raw), idx, mode=CombineMode.SUM)
    # before calibration: plain packed path
    np.testing.assert_allclose(
        np.asarray(t.lookup(idx)), ref, rtol=2e-5, atol=1e-5
    )
    t.calibrate(idx)
    np.testing.assert_allclose(
        np.asarray(t.lookup(idx)), ref, rtol=2e-5, atol=1e-5
    )
    # logical view round-trips the reorder
    np.testing.assert_allclose(
        np.asarray(t.logical_table()[t.remap]), np.asarray(raw),
        rtol=0, atol=0,
    )
