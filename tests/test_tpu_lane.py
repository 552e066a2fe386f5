"""Real-TPU test lane: catch Mosaic/XLA lowering regressions on-chip.

Run with ``JAX_PLATFORMS=tpu python -m pytest tests/ -m tpu -q`` on a
machine with an attached chip (tests/conftest.py skips the CPU forcing
when JAX_PLATFORMS=tpu). Everything here is small — the point is that
the production code paths *compile and execute* on real hardware and
match the golden models, not performance (that is the benchmark's job).

Under the default CPU suite these tests are skipped.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cuembed_tpu.ops.api import embedding_lookup, embedding_lookup_csr
from cuembed_tpu.ops.tiered import TieredConfig, tiered_forward
from cuembed_tpu.ref.forward import embedding_forward_ref
from cuembed_tpu.types import CombineMode

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() != "tpu", reason="needs a real TPU chip"
    ),
]


def _table(rng, v, w, dtype=np.float32):
    return rng.standard_normal((v, w)).astype(dtype)


def test_xla_forward_on_chip():
    rng = np.random.default_rng(0)
    table = _table(rng, 1000, 128)
    idx = rng.integers(0, 1000, (64, 16)).astype(np.int32)
    out = embedding_lookup(
        jnp.asarray(table), jnp.asarray(idx), mode=CombineMode.SUM,
        backend="xla",
    )
    ref = embedding_forward_ref(table, idx, mode=CombineMode.SUM)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-5, atol=3e-5)


def test_tiered_forward_on_chip():
    rng = np.random.default_rng(1)
    table = _table(rng, 4096, 128)
    idx = rng.integers(0, 4096, (128, 8)).astype(np.int32)
    cfg = TieredConfig(hot_rows=1024, chunk_elems=256, cold_slots=256,
                       mxu_head_rows=128, mid_slots=256)
    out = tiered_forward(
        jnp.asarray(table), jnp.asarray(idx), mode=CombineMode.SUM, cfg=cfg
    )
    ref = embedding_forward_ref(table, idx, mode=CombineMode.SUM)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-5, atol=3e-5)


def test_pallas_forward_on_chip_compiled():
    """The Pallas kernel in real (non-interpret) Mosaic lowering."""
    from cuembed_tpu.ops import pallas_forward

    rng = np.random.default_rng(2)
    table = _table(rng, 512, 128)
    idx = rng.integers(0, 512, (32, 8)).astype(np.int32)
    out = pallas_forward.embedding_forward_pallas(
        jnp.asarray(table), jnp.asarray(idx), None, None,
        mode=CombineMode.SUM,
    )
    ref = embedding_forward_ref(table, idx, mode=CombineMode.SUM)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-5, atol=3e-5)


def test_narrow_packed_on_chip():
    from cuembed_tpu.ops.narrow import narrow_lookup, pack_narrow

    rng = np.random.default_rng(3)
    table = _table(rng, 1000, 32)
    idx = rng.integers(0, 1000, (64, 8)).astype(np.int32)
    packed = pack_narrow(jnp.asarray(table))
    out = narrow_lookup(packed, 1000, 32, jnp.asarray(idx),
                        mode=CombineMode.SUM)
    ref = embedding_forward_ref(table, idx, mode=CombineMode.SUM)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-5, atol=3e-5)


def test_csr_forward_backward_on_chip():
    rng = np.random.default_rng(4)
    table = _table(rng, 500, 128)
    offsets = np.array([0, 3, 3, 7, 12], np.int32)
    idx = rng.integers(0, 500, (16,)).astype(np.int32)

    def loss(t):
        out = embedding_lookup_csr(
            t, jnp.asarray(idx), jnp.asarray(offsets), mode=CombineMode.MEAN
        )
        return jnp.sum(out * out)

    g = jax.grad(loss)(jnp.asarray(table))
    assert np.isfinite(np.asarray(g)).all()


def test_pallas_csr_forward_on_chip_compiled():
    """The ragged-CSR Pallas forward in real Mosaic lowering, incl. a
    sample spanning the 512-position block boundary."""
    from cuembed_tpu.ops.pallas_forward import embedding_forward_pallas_csr

    rng = np.random.default_rng(5)
    V, B = 400, 6
    table = rng.integers(-8, 9, size=(V, 128)).astype(np.float32)
    per = np.array([40, 600, 0, 200, 17, 5])
    offsets = np.zeros(B + 1, np.int32)
    offsets[1:] = np.cumsum(per)
    cap = int(offsets[-1]) + 61
    idx = np.zeros(cap, np.int32)
    idx[: offsets[-1]] = rng.integers(0, V, offsets[-1])
    got = embedding_forward_pallas_csr(
        jnp.asarray(table), jnp.asarray(idx), jnp.asarray(offsets)
    )
    ref = embedding_forward_ref(table, idx, offsets=offsets)
    np.testing.assert_array_equal(np.asarray(got), ref)


@pytest.mark.parametrize("batch,hotness", [(32, 8), (128, 12)])
def test_pallas_backward_on_chip_compiled(batch, hotness):
    """The run-grouped Pallas backward in real Mosaic lowering.

    The (128, 12) case gives cap = 1536 > 512, so the multi-block SMEM
    stream lowering (3 grid steps, runs spanning block boundaries) is
    exercised — the single-block case alone left that path latent.
    """
    from cuembed_tpu.ops.lookup_xla import embedding_backward_xla
    from cuembed_tpu.ops.pallas_backward import embedding_backward_pallas

    rng = np.random.default_rng(6)
    V, W = 300, 128
    idx = rng.integers(0, V, batch * hotness).astype(np.int32)
    sid = (np.arange(batch * hotness, dtype=np.int32) // hotness)
    order = np.argsort(idx, kind="stable")
    t_idx, t_sid = jnp.asarray(idx[order]), jnp.asarray(sid[order])
    gy = jnp.asarray(rng.integers(-10, 11, (batch, W)).astype(np.float32))

    ref = embedding_backward_xla(gy, V, t_idx, t_sid, None)
    got = embedding_backward_pallas(gy, V, t_idx, t_sid, None)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pallas_backward_weighted_multiblock_on_chip():
    """Weighted multi-block backward: the coeff SMEM stream also rides
    the [n_blocks, 1, nb] layout."""
    from cuembed_tpu.ops.lookup_xla import embedding_backward_xla
    from cuembed_tpu.ops.pallas_backward import embedding_backward_pallas

    rng = np.random.default_rng(7)
    V, W, batch, hotness = 200, 128, 96, 8  # cap = 768 -> 2 blocks
    idx = rng.integers(0, V, batch * hotness).astype(np.int32)
    sid = (np.arange(batch * hotness, dtype=np.int32) // hotness)
    w = rng.integers(-4, 5, batch * hotness).astype(np.float32)
    order = np.argsort(idx, kind="stable")
    t_idx, t_sid = jnp.asarray(idx[order]), jnp.asarray(sid[order])
    t_w = jnp.asarray(w[order])
    gy = jnp.asarray(rng.integers(-10, 11, (batch, W)).astype(np.float32))

    ref = embedding_backward_xla(gy, V, t_idx, t_sid, t_w)
    got = embedding_backward_pallas(gy, V, t_idx, t_sid, t_w)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_train_step_on_chip():
    from cuembed_tpu.train import sgd_sparse_update

    rng = np.random.default_rng(5)
    table = jnp.asarray(_table(rng, 2048, 128))
    idx = jnp.asarray(rng.integers(0, 2048, (64, 8)).astype(np.int32))
    grad_y = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
    new_table = sgd_sparse_update(table, idx, grad_y, lr=0.1)
    assert np.isfinite(np.asarray(new_table)).all()
    assert not np.array_equal(np.asarray(new_table), np.asarray(table))


def test_fused_group_on_chip():
    """Fused multi-table group: one lookup + one sparse update, real
    XLA:TPU lowering, parity vs per-table ops."""
    from cuembed_tpu.fused import (
        fuse_tables,
        fused_lookup,
        fused_sgd_update,
        unfuse_table,
    )
    from cuembed_tpu.train import sgd_sparse_update

    rng = np.random.default_rng(7)
    names = ["a", "b", "c"]
    tables = {
        n: jnp.asarray(_table(rng, 512, 128)) for n in names
    }
    hot = {"a": 8, "b": 4, "c": 8}
    idx = {
        n: jnp.asarray(rng.integers(0, 512, (32, hot[n])).astype(np.int32))
        for n in names
    }
    fused, spec = fuse_tables(tables, hot)
    got = fused_lookup(fused, spec, idx, mode=CombineMode.SUM)
    for n in names:
        want = embedding_lookup(tables[n], idx[n], mode=CombineMode.SUM)
        np.testing.assert_allclose(
            np.asarray(got[n]), np.asarray(want), rtol=1e-5, atol=1e-5
        )
    gys = {
        n: jnp.asarray(rng.standard_normal((32, 128)).astype(np.float32))
        for n in names
    }
    new = fused_sgd_update(fused, spec, idx, gys, lr=0.1)
    parts = unfuse_table(new, spec)
    for n in names:
        want = sgd_sparse_update(tables[n], idx[n], gys[n], lr=0.1)
        np.testing.assert_allclose(
            np.asarray(parts[n]), np.asarray(want), rtol=1e-4, atol=1e-5
        )


def test_offload_lookup_on_chip():
    """Host-offloaded table: device head + shipped cold rows, real
    XLA:TPU lowering, parity vs a resident table."""
    from cuembed_tpu.offload import HostOffloadTable

    rng = np.random.default_rng(8)
    V, hot, W = 4096, 512, 128
    table = rng.standard_normal((V, W)).astype(np.float32)
    idx = np.where(
        rng.random((64, 8)) < 0.7,
        rng.integers(0, hot, (64, 8)),
        rng.integers(hot, V, (64, 8)),
    ).astype(np.int32)
    off = HostOffloadTable(table, hot, cold_cap=512)
    got = off.lookup(off.prepare(idx))
    want = embedding_lookup(
        jnp.asarray(table), jnp.asarray(idx), backend="xla"
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )
    gy = jnp.asarray(rng.standard_normal((64, W)).astype(np.float32))
    off.sgd_update(off.prepare(idx), gy, lr=0.1)
    assert np.isfinite(off.full_table()).all()


def test_int8_serving_lookup_on_chip():
    """Whole-table int8 serving gather+dequant in real TPU lowering."""
    from cuembed_tpu.ops.quant import int8_serving_lookup, quantize_head

    rng = np.random.default_rng(9)
    table = jnp.asarray(rng.standard_normal((1024, 256)).astype(np.float32))
    qt = quantize_head(table)
    idx = jnp.asarray(rng.integers(0, 1024, (32, 8)).astype(np.int32))
    got = int8_serving_lookup(qt, idx)
    want = embedding_lookup(table, idx, backend="xla")
    row_max = np.abs(np.asarray(table)).max(axis=1)
    bound = (row_max[np.asarray(idx)] / 254.0).sum(axis=1) + 1e-5
    err = np.abs(np.asarray(got) - np.asarray(want)).max(axis=1)
    assert (err <= bound).all()


def test_qr_embedding_on_chip():
    """QR compositional embeddings: both compose ops lower and match the
    composed full table on real hardware (the mult path exercises
    CONCAT lookups + elementwise pooling)."""
    from cuembed_tpu.models import QREmbeddingBag

    rng = np.random.default_rng(11)
    V, W, Q, B, H = 2000, 64, 43, 32, 8
    idx = rng.integers(0, V, (B, H)).astype(np.int32)
    for operation in ("add", "mult"):
        bag = QREmbeddingBag(V, W, Q, operation=operation)
        params = bag.init(jax.random.key(7))
        got = np.asarray(bag.apply(params, jnp.asarray(idx)))
        q = np.asarray(params["q"])
        r = np.asarray(params["r"])
        ids = np.arange(V)
        full = (
            q[ids // Q] + r[ids % Q]
            if operation == "add"
            else q[ids // Q] * r[ids % Q]
        )
        ref = embedding_forward_ref(
            full.astype(np.float32), idx, mode=CombineMode.SUM
        )
        np.testing.assert_allclose(
            got, ref, rtol=3e-5, atol=3e-5, err_msg=operation
        )
