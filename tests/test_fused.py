"""Fused multi-table lookup: parity vs per-table ops.

Fusion must be semantically invisible — every pooled output and every
sparse update equals the per-table result bit-for-bit (the fused path
runs the same gather/scatter machinery on offset ids).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuembed_tpu import (
    CombineMode,
    embedding_lookup,
    fuse_counts,
    fuse_tables,
    fused_adagrad_update,
    fused_lookup,
    fused_sgd_update,
    rowwise_adagrad_sparse_update,
    sgd_sparse_update,
    unfuse_table,
)
from cuembed_tpu.utils.frequency import frequency_order


def _group(rng, sizes, hotness, width=16, batch=32):
    names = [f"t{i}" for i in range(len(sizes))]
    tables = {
        n: jnp.asarray(
            rng.standard_normal((v, width)).astype(np.float32)
        )
        for n, v in zip(names, sizes)
    }
    hot = dict(zip(names, hotness))
    idx = {
        n: jnp.asarray(
            rng.integers(0, v, (batch, hot[n])).astype(np.int32)
        )
        for n, v in zip(names, sizes)
    }
    return names, tables, hot, idx


def test_fuse_roundtrip():
    rng = np.random.default_rng(0)
    names, tables, hot, _ = _group(rng, [64, 128, 32], [4, 4, 4])
    fused, spec = fuse_tables(tables, hot)
    assert fused.shape == (224, 16)
    assert spec.bases == (0, 64, 192)
    back = unfuse_table(fused, spec)
    for n in names:
        np.testing.assert_array_equal(
            np.asarray(back[n]), np.asarray(tables[n])
        )


def test_fuse_rejects_mixed_shapes():
    rng = np.random.default_rng(1)
    tables = {
        "a": jnp.zeros((8, 16), jnp.float32),
        "b": jnp.zeros((8, 32), jnp.float32),
    }
    with pytest.raises(ValueError, match="width"):
        fuse_tables(tables, {"a": 1, "b": 1})


@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN])
@pytest.mark.parametrize("hotness", [(4, 4, 4), (4, 2, 7)])
def test_fused_lookup_matches_per_table(mode, hotness):
    rng = np.random.default_rng(2)
    names, tables, hot, idx = _group(rng, [64, 128, 32], hotness)
    fused, spec = fuse_tables(tables, hot)
    got = fused_lookup(fused, spec, idx, mode=mode, backend="xla")
    for n in names:
        want = embedding_lookup(
            tables[n], idx[n], mode=mode, backend="xla"
        )
        np.testing.assert_allclose(
            np.asarray(got[n]), np.asarray(want),
            rtol=1e-6, atol=1e-6, err_msg=n,
        )


def test_fused_lookup_weighted():
    rng = np.random.default_rng(3)
    names, tables, hot, idx = _group(rng, [64, 32], [4, 3])
    w = {
        n: jnp.asarray(
            rng.standard_normal(idx[n].shape).astype(np.float32)
        )
        for n in names
    }
    fused, spec = fuse_tables(tables, hot)
    got = fused_lookup(fused, spec, idx, w, backend="xla")
    for n in names:
        want = embedding_lookup(tables[n], idx[n], w[n], backend="xla")
        np.testing.assert_allclose(
            np.asarray(got[n]), np.asarray(want), rtol=1e-5, atol=1e-6,
        )


def test_fused_lookup_concat_raises():
    rng = np.random.default_rng(4)
    _, tables, hot, idx = _group(rng, [64], [4])
    fused, spec = fuse_tables(tables, hot)
    with pytest.raises(ValueError, match="CONCAT"):
        fused_lookup(fused, spec, idx, mode=CombineMode.CONCAT)


def test_fused_sgd_matches_per_table():
    rng = np.random.default_rng(5)
    names, tables, hot, idx = _group(rng, [64, 128], [4, 2], batch=16)
    gys = {
        n: jnp.asarray(rng.standard_normal((16, 16)).astype(np.float32))
        for n in names
    }
    fused, spec = fuse_tables(tables, hot)
    new = fused_sgd_update(fused, spec, idx, gys, lr=0.1)
    parts = unfuse_table(new, spec)
    for n in names:
        want = sgd_sparse_update(tables[n], idx[n], gys[n], lr=0.1)
        np.testing.assert_allclose(
            np.asarray(parts[n]), np.asarray(want),
            rtol=1e-5, atol=1e-6, err_msg=n,
        )


def test_fused_adagrad_matches_per_table():
    rng = np.random.default_rng(6)
    names, tables, hot, idx = _group(rng, [64, 128], [3, 3], batch=16)
    gys = {
        n: jnp.asarray(rng.standard_normal((16, 16)).astype(np.float32))
        for n in names
    }
    fused, spec = fuse_tables(tables, hot)
    accum = jnp.zeros((spec.total_rows,), jnp.float32)
    new_t, new_a = fused_adagrad_update(
        fused, accum, spec, idx, gys, lr=0.1
    )
    t_parts = unfuse_table(new_t, spec)
    for n, b, s in zip(spec.names, spec.bases, spec.sizes):
        want_t, want_a = rowwise_adagrad_sparse_update(
            tables[n],
            jnp.zeros((s,), jnp.float32),
            idx[n], gys[n], lr=0.1,
        )
        np.testing.assert_allclose(
            np.asarray(t_parts[n]), np.asarray(want_t),
            rtol=1e-5, atol=1e-6, err_msg=n,
        )
        np.testing.assert_allclose(
            np.asarray(new_a)[b : b + s], np.asarray(want_a),
            rtol=1e-5, atol=1e-6, err_msg=n,
        )


def test_fused_remap_invisible():
    """A frequency reorder of the FUSED table + its remap leaves every
    pooled output unchanged (the tiered-engine enablement path)."""
    rng = np.random.default_rng(7)
    names, tables, hot, idx = _group(rng, [64, 32], [4, 4])
    fused, spec = fuse_tables(tables, hot)
    counts = {
        n: np.bincount(
            np.asarray(idx[n]).reshape(-1), minlength=v
        ).astype(np.int64)
        for n, v in zip(names, (64, 32))
    }
    perm, remap = frequency_order(fuse_counts(spec, counts))
    reordered = jnp.asarray(np.asarray(fused)[perm])
    base = fused_lookup(fused, spec, idx, backend="xla")
    got = fused_lookup(
        reordered, spec, idx, remap=jnp.asarray(remap), backend="xla"
    )
    for n in names:
        np.testing.assert_allclose(
            np.asarray(got[n]), np.asarray(base[n]),
            rtol=1e-6, atol=1e-6, err_msg=n,
        )


def test_fused_lookup_is_differentiable():
    rng = np.random.default_rng(8)
    names, tables, hot, idx = _group(rng, [64, 32], [4, 4], batch=8)
    fused, spec = fuse_tables(tables, hot)

    def loss(f):
        out = fused_lookup(f, spec, idx, backend="xla")
        return sum(jnp.sum(o**2) for o in out.values())

    g = jax.grad(loss)(fused)
    assert g.shape == fused.shape
    assert bool(jnp.isfinite(g).all())
    # rows never looked up get zero gradient
    touched = np.zeros(spec.total_rows, bool)
    for n, b in zip(spec.names, spec.bases):
        touched[np.asarray(idx[n]).reshape(-1) + b] = True
    np.testing.assert_array_equal(
        np.asarray(g)[~touched], 0.0
    )


def test_dlrm_fused_matches_unfused():
    """DLRM(fused=True) is numerically identical to the per-table model
    with the same init key — the fused table is the same rows stacked."""
    from cuembed_tpu.models import DLRM, DLRMConfig

    rng = np.random.default_rng(9)
    base = dict(
        table_sizes=(500, 300, 700),
        embed_width=32,
        hotness=4,
        dense_features=8,
        bottom_mlp=(16, 32),
        top_mlp=(16, 1),
    )
    m0 = DLRM(DLRMConfig(**base))
    m1 = DLRM(DLRMConfig(**base, fused=True))
    p0 = m0.init(jax.random.key(0))
    p1 = m1.init(jax.random.key(0))
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(t) for t in p0["tables"]]),
        np.asarray(p1["tables"]),
    )
    B = 16
    dense = jnp.asarray(rng.standard_normal((B, 8)).astype(np.float32))
    sparse = tuple(
        jnp.asarray(rng.integers(0, v, (B, 4)).astype(np.int32))
        for v in base["table_sizes"]
    )
    out0 = m0.apply(p0, dense, sparse, backend="xla")
    out1 = m1.apply(p1, dense, sparse, backend="xla")
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out0), rtol=1e-5, atol=1e-5
    )
    # a train step flows gradients into the single fused table
    labels = jnp.asarray(rng.integers(0, 2, B).astype(np.float32))
    p1b, loss = m1.sgd_step(p1, dense, sparse, labels, backend="xla")
    assert np.isfinite(float(loss))
    assert not np.array_equal(
        np.asarray(p1b["tables"]), np.asarray(p1["tables"])
    )


# ---------------------------------------------------------------------------
# Sharded fused group (multi-chip mirror)
# ---------------------------------------------------------------------------


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)
@pytest.mark.parametrize("mode", [CombineMode.SUM, CombineMode.MEAN])
def test_fused_sharded_matches_per_table(mode):
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from cuembed_tpu import (
        fused_sharded_adagrad_update,
        fused_sharded_lookup,
        fused_sharded_sgd_update,
    )
    from cuembed_tpu.parallel import pad_table_for_shards

    rng = np.random.default_rng(9)
    # batch * T = 32 * 4 = 128, divisible by the 4-way model axis
    names, tables, hot, idx = _group(
        rng, [64, 128, 32, 96], [4, 2, 4, 3]
    )
    mesh = Mesh(
        np.array(jax.devices()[:8]).reshape(2, 4), ("data", "model")
    )
    fused, spec = fuse_tables(tables, hot)
    padded = pad_table_for_shards(fused, 4)
    fs = jax.device_put(padded, NamedSharding(mesh, P("model", None)))

    got = fused_sharded_lookup(fs, spec, idx, mesh=mesh, mode=mode)
    for n in names:
        want = embedding_lookup(
            tables[n], idx[n], mode=mode, backend="xla"
        )
        np.testing.assert_allclose(
            np.asarray(got[n]), np.asarray(want),
            rtol=1e-5, atol=1e-5, err_msg=n,
        )

    gys = {
        n: jnp.asarray(
            rng.standard_normal((32, spec.width)).astype(np.float32)
        )
        for n in names
    }
    new = fused_sharded_sgd_update(
        fs, spec, idx, gys, mesh=mesh, lr=0.1, mode=mode
    )
    want_new = fused_sgd_update(fused, spec, idx, gys, lr=0.1, mode=mode)
    np.testing.assert_allclose(
        np.asarray(new)[: spec.total_rows], np.asarray(want_new),
        rtol=1e-5, atol=1e-5,
    )

    accum = jax.device_put(
        jnp.zeros((padded.shape[0],), jnp.float32),
        NamedSharding(mesh, P("model")),
    )
    nt, na = fused_sharded_adagrad_update(
        fs, accum, spec, idx, gys, mesh=mesh, lr=0.1, mode=mode
    )
    want_t, want_a = fused_adagrad_update(
        fused, jnp.zeros((spec.total_rows,), jnp.float32), spec, idx,
        gys, lr=0.1, mode=mode,
    )
    np.testing.assert_allclose(
        np.asarray(nt)[: spec.total_rows], np.asarray(want_t),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(na)[: spec.total_rows], np.asarray(want_a),
        rtol=1e-4, atol=1e-5,
    )
